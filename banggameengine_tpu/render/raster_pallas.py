"""Pallas TPU kernel for the visibility-pass tile rasterizer.

One grid step = one screen tile.  The tile's pre-gathered triangle list is
streamed through VMEM and the depth/id/barycentric buffers live in VMEM
**for the whole triangle loop** — the XLA scan version round-trips its
[tiles, 32, 128] carries through HBM every chunk iteration; here they are
written back exactly once per tile.

The math is identical to :func:`banggameengine_tpu.render.raster._raster_tile`
(edge functions over the whole 32x128 pixel block, two-sided coverage, depth
LESS, original-triangle barycentrics via the per-corner matrix); parity is
tested in interpret mode on CPU against the XLA path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from banggameengine_tpu.render.raster import TILE_H, TILE_W

Array = jax.Array


def _tile_kernel(tidx_ref, x_ref, y_ref, z_ref, oid_ref, cb1_ref, cb2_ref,
                 ok_ref, zb_ref, tid_ref, b1_ref, b2_ref, slot_ref, *,
                 chunk: int, tiles_x: int):
    """Raster one tile.  Refs hold this tile's triangle list ([K,3] coords,
    [K] ids/valid, [K,3] original-bary columns) and the [TILE_H, TILE_W]
    outputs.  ``tidx_ref`` carries the SCREEN tile index (the grid may cover
    an arbitrary tile subset, e.g. the heavy pass)."""
    k = ok_ref.shape[1]
    tile = tidx_ref[pl.program_id(0)]
    tx0 = (jnp.mod(tile, tiles_x) * TILE_W).astype(jnp.float32)
    ty0 = ((tile // tiles_x) * TILE_H).astype(jnp.float32)

    # iota must be integer-typed on TPU; cast after
    px = tx0 + jax.lax.broadcasted_iota(
        jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32) + 0.5
    py = ty0 + jax.lax.broadcasted_iota(
        jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32) + 0.5

    zb_ref[0] = jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32)
    tid_ref[0] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)
    b1_ref[0] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    b2_ref[0] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    slot_ref[0] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)

    def chunk_body(ci, _):
        # chunk slicing stays on the SUBLANE dim (multiple-of-8 provable);
        # the lane dims (3 / 1) are never dynamically sliced
        base = pl.multiple_of(ci * chunk, chunk)
        x = x_ref[0, pl.ds(base, chunk), :]         # [C,3]
        y = y_ref[0, pl.ds(base, chunk), :]
        zz = z_ref[0, pl.ds(base, chunk), :]
        oid = oid_ref[0, pl.ds(base, chunk), 0]
        cb1 = cb1_ref[0, pl.ds(base, chunk), :]
        cb2 = cb2_ref[0, pl.ds(base, chunk), :]
        okc = ok_ref[0, pl.ds(base, chunk), 0]

        zbuf = zb_ref[0]
        tid = tid_ref[0]
        b1b = b1_ref[0]
        b2b = b2_ref[0]
        slotb = slot_ref[0]

        # Batched edge math: every per-triangle quantity becomes a [C,1,1]
        # broadcast against the [H,W] pixel block, so the whole chunk is
        # pure vector work — the per-triangle python loop below only runs
        # the 6-op select chain (the original unrolled form spent its time
        # on ~9 scalar memory extracts per triangle).  Operation order and
        # associativity match the scalar version exactly (bit parity with
        # the XLA path is tested).
        # Mosaic cannot broadcast one value across sublanes AND lanes in a
        # single op ("Broadcast in both sublanes and lanes"), so lift each
        # per-triangle scalar to [C,H,1] first (sublane broadcast); the
        # arithmetic below then only ever broadcasts the lane dim.
        def col(a, j):
            v = a[:, j][:, None, None]              # [C,1,1]
            return jnp.broadcast_to(v, (chunk, TILE_H, 1))

        x0, x1, x2 = col(x, 0), col(x, 1), col(x, 2)
        y0, y1, y2 = col(y, 0), col(y, 1), col(y, 2)
        pxb = px[None]                              # [1,H,W]
        pyb = py[None]
        e0 = (x1 - x0) * (pyb - y0) - (y1 - y0) * (pxb - x0)
        e1 = (x2 - x1) * (pyb - y1) - (y2 - y1) * (pxb - x1)
        e2 = (x0 - x2) * (pyb - y2) - (y0 - y2) * (pxb - x2)
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        pos = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
        neg = (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
        apos = area > 0
        cover = (pos & apos) | (neg & ~apos)       # select-free two-sided
        safe_area = jnp.where(jnp.abs(area) > 1e-9, area, 1e-9)
        inv_area = 1.0 / safe_area
        w1 = e2 * inv_area
        w2 = e0 * inv_area
        w0 = 1.0 - w1 - w2
        depth = w0 * col(zz, 0) + w1 * col(zz, 1) + w2 * col(zz, 2)
        okb = jnp.broadcast_to(
            (okc != 0)[:, None, None], (chunk, TILE_H, 1))
        ok_all = cover & okb & (depth >= 0.0) & (depth <= 1.0)
        ob1 = w0 * col(cb1, 0) + w1 * col(cb1, 1) + w2 * col(cb1, 2)
        ob2 = w0 * col(cb2, 0) + w1 * col(cb2, 1) + w2 * col(cb2, 2)

        for c in range(chunk):                      # select chain only
            better = ok_all[c] & (depth[c] < zbuf)
            zbuf = jnp.where(better, depth[c], zbuf)
            # oid[c] as a 0-d SCALAR: a scalar splat is the one broadcast
            # Mosaic allows across both tiled dims (a sliced [H,1] int
            # plane canonicalizes back into an illegal 2-dim
            # broadcast_in_dim); one scalar extract per triangle is noise
            tid = jnp.where(better, jnp.full_like(tid, oid[c]), tid)
            b1b = jnp.where(better, ob1[c], b1b)
            b2b = jnp.where(better, ob2[c], b2b)
            slotb = jnp.where(better, base + c, slotb)
        zb_ref[0] = zbuf
        tid_ref[0] = tid
        b1_ref[0] = b1b
        b2_ref[0] = b2b
        slot_ref[0] = slotb
        return 0

    jax.lax.fori_loop(0, k // chunk, chunk_body, 0)
    zb_ref[0] = jnp.where(jnp.isfinite(zb_ref[0]), zb_ref[0], 1.0)


def raster_tiles_pallas(
    tile_indices: Array,  # i32[tiles] screen tile index per grid step
    g_x: Array,    # f32[tiles, K, 3]
    g_y: Array,
    g_z: Array,
    g_oid: Array,  # i32[tiles, K]
    g_cb1: Array,  # f32[tiles, K, 3] original-bary column 1 per corner
    g_cb2: Array,
    g_ok: Array,   # i32[tiles, K] (0/1)
    tiles_x: int,
    chunk: int = 8,
    interpret: bool = False,
):
    """Run the tile kernel over all listed tiles.  Returns (zb, tid, b1,
    b2, slot) each [tiles, TILE_H, TILE_W] (slot = winning index in the
    tile's triangle list, -1 background)."""
    n_tiles, k = g_ok.shape

    def row(i, *_prefetch):
        return (i, 0, 0)

    def row2(i, *_prefetch):
        return (i, 0)

    # Mosaic block rule: the last two BLOCK dims must be divisible by (8,
    # 128) or equal the array dims — so 1-D per-tile vectors are carried as
    # [tiles, 1, k] with (1, 1, k) blocks.
    in_specs = [
        pl.BlockSpec((1, k, 3), row, memory_space=pltpu.VMEM),  # x
        pl.BlockSpec((1, k, 3), row, memory_space=pltpu.VMEM),  # y
        pl.BlockSpec((1, k, 3), row, memory_space=pltpu.VMEM),  # z
        pl.BlockSpec((1, k, 1), row, memory_space=pltpu.VMEM),  # oid
        pl.BlockSpec((1, k, 3), row, memory_space=pltpu.VMEM),  # cb1
        pl.BlockSpec((1, k, 3), row, memory_space=pltpu.VMEM),  # cb2
        pl.BlockSpec((1, k, 1), row, memory_space=pltpu.VMEM),  # ok
    ]
    out_specs = [
        pl.BlockSpec((1, TILE_H, TILE_W), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_H, TILE_W), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_H, TILE_W), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_H, TILE_W), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_H, TILE_W), row, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.int32),
    ]

    def kernel(tidx, x, y, z, oid, cb1, cb2, ok, zb, tid, b1, b2, slot):
        _tile_kernel(tidx, x, y, z, oid, cb1, cb2, ok, zb, tid, b1, b2,
                     slot, chunk=chunk, tiles_x=tiles_x)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # tile_indices
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    zb, tid, b1, b2, slot = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(tile_indices.astype(jnp.int32),
      g_x, g_y, g_z, g_oid[:, :, None], g_cb1, g_cb2, g_ok[:, :, None])
    return zb, tid, b1, b2, slot
