"""Fused Pallas TPU kernel: tile visibility raster + one-hot attribute
resolve in ONE kernel — the depth/slot planes never round-trip HBM.

Together with ``raster.py``/``shading.py`` this replaces the reference's
GPU submission path (``/root/reference/src/render/Renderer.cpp:601-730``,
per-submesh draws into a D3D11 device via bgfx) with TPU-native software
rasterization; there is no reference counterpart to the kernels
themselves — a GPU's fixed-function rasterizer is the thing being
re-imagined for the MXU/VPU.

This executes the round-4 verdict's "standing exception": the XLA tile
scan writes (depth, slot) to HBM and the Pallas resolve reads them back,
with the scan ALSO carrying its planes through HBM on every chunk
iteration.  Here one grid program owns a block of tiles; per tile the
depth/slot registers live in VMEM across the whole triangle walk, and the
winning slots feed the one-hot MXU resolve immediately.

Design notes (why this kernel wins where the round-3/4 raster kernel
lost — that one ran one PROGRAM per tile with [K, 3]-lane-minor triangle
data and a per-triangle select chain):

- **blocked grid**: ``tiles_blk`` tiles per program (launch/DMA overhead
  amortized exactly like ``resolve_pallas.py``);
- **count-adaptive triangle walk**: the per-tile walk is a
  ``fori_loop`` whose trip count comes from the tile's OWN binned
  triangle count (scalar-prefetch, SMEM).  The XLA light/heavy split
  pays ``light_capacity`` slots on every tile plus a 64-tile re-raster
  at heavy capacity; this walk pays ``ceil(count/chunk)`` chunks —
  nearly-empty tiles pay one — and covers EVERY tile up to the full
  walk width (no top-64 heavy selection, no lax.cond re-raster, no
  double raster of dense tiles).
- **flat [chunk, px] edge math**: the pixel block is the flat
  ``TILE_H*TILE_W`` lane vector; per-triangle scalars sit on sublanes
  ([chunk, 1] columns of the pre-packed [K, 16] per-tile table, K on
  sublanes) and broadcast along lanes only — no sublane+lane double
  broadcasts, no scalar extracts in the hot loop.
- **fused resolve**: the winning slot vector (still in VMEM) drives the
  same chunked one-hot MXU contraction as ``resolve_tiles_pallas_wide``,
  predicated per tile on the walked width (chunks past the tile's count
  are skipped by ``lax.cond``).

Outputs: resolved channel planes [C_pad, tiles, px], depth [tiles, px],
slot [tiles, px].  Bit-parity with the XLA slim raster path is tested
(the op sequence per chunk matches ``raster._raster_tile``'s
``chunk_body_slim`` exactly: same first-min tie-breaking, same
edge-function associativity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# packed per-tile triangle table rows (lane dim)
ROW_X0, ROW_X1, ROW_X2 = 0, 1, 2
ROW_Y0, ROW_Y1, ROW_Y2 = 3, 4, 5
ROW_Z0, ROW_Z1, ROW_Z2 = 6, 7, 8
ROW_OK = 9
PACK_CH = 16          # padded to a lane-slice-friendly width


def _raster_resolve_kernel(counts_ref, tri_ref, tab_ref, res_ref, depth_ref,
                           slot_ref, *, chunk: int, k_pad: int, kl_pad: int,
                           tiles_blk: int, px: int, tile_w: int,
                           tiles_x: int, resolve: bool):
    """One block of tiles: count-adaptive raster walk + fused resolve.

    tri_ref:  f32[blk, K_pad, PACK_CH]  packed per-tile triangle rows
              (K on sublanes, channels on lanes)
    tab_ref:  f32[blk, C_pad, KL_pad]   resolve tables (when resolve)
    res_ref:  f32[C_pad, blk, px]
    depth_ref/slot_ref: [blk, px]
    counts_ref: i32[n_tiles] walked-slot count per tile (SMEM prefetch)
    """
    blk_i = pl.program_id(0)
    th = px // tile_w
    # pixel block as [SUB=8, px//8] — full sublane utilization for every
    # per-pixel value (a flat [1, px] vector uses 1/8 of each vreg and
    # measured 3.2x the per-chunk cost of the XLA scan)
    sub = 8
    lpx = px // sub
    p = (jax.lax.broadcasted_iota(jnp.int32, (sub, lpx), 0) * lpx
         + jax.lax.broadcasted_iota(jnp.int32, (sub, lpx), 1))  # flat idx
    pxv = (p % tile_w).astype(jnp.float32) + 0.5      # + tile origin below
    pyv = (p // tile_w).astype(jnp.float32) + 0.5
    cidx = jax.lax.broadcasted_iota(jnp.int32, (chunk, sub, lpx), 0)

    cols = []
    for b in range(tiles_blk):                        # static unroll
        tile = blk_i * tiles_blk + b
        tx0 = (jnp.mod(tile, tiles_x) * tile_w).astype(jnp.float32)
        ty0 = ((tile // tiles_x) * th).astype(jnp.float32)
        pxb = pxv + tx0                               # [sub, lpx]
        pyb = pyv + ty0

        cnt = counts_ref[tile]
        n_chunks = jnp.minimum((cnt + (chunk - 1)) // chunk,
                               k_pad // chunk)

        def walk(ci, carry, pxb=pxb, pyb=pyb, b=b):
            zbuf, slotb = carry                       # [sub, lpx] each
            base = pl.multiple_of(ci * chunk, chunk)
            rows = tri_ref[b, pl.ds(base, chunk), :]  # [chunk, PACK_CH]

            def col(j):
                # [chunk] -> [chunk, sub, 1]: sublane broadcast first
                # (Mosaic cannot broadcast sublanes AND lanes in one op);
                # the arithmetic below then broadcasts lanes only
                v = rows[:, j][:, None, None]
                return jnp.broadcast_to(v, (chunk, sub, 1))

            x0, x1, x2 = col(ROW_X0), col(ROW_X1), col(ROW_X2)
            y0, y1, y2 = col(ROW_Y0), col(ROW_Y1), col(ROW_Y2)
            z0, z1, z2 = col(ROW_Z0), col(ROW_Z1), col(ROW_Z2)
            okc = col(ROW_OK)
            pxc = pxb[None]                           # [1, sub, lpx]
            pyc = pyb[None]
            # identical op sequence to raster._raster_tile chunk_depth
            e0 = (x1 - x0) * (pyc - y0) - (y1 - y0) * (pxc - x0)
            e1 = (x2 - x1) * (pyc - y1) - (y2 - y1) * (pxc - x1)
            e2 = (x0 - x2) * (pyc - y2) - (y0 - y2) * (pxc - x2)
            area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
            pos = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
            neg = (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
            # select-free two-sided coverage: Mosaic cannot lower a
            # bool-valued select (i8->i1 trunci); logically identical to
            # jnp.where(area > 0, pos, neg)
            apos = area > 0
            cover = (pos & apos) | (neg & ~apos)
            inv_area = 1.0 / jnp.where(jnp.abs(area) > 1e-9, area, 1e-9)
            w1 = e2 * inv_area
            w2 = e0 * inv_area
            w0 = 1.0 - w1 - w2
            depth = w0 * z0 + w1 * z1 + w2 * z2       # [chunk, sub, lpx]
            ok = cover & (okc > 0.0) & (depth >= 0.0) & (depth <= 1.0)
            depth = jnp.where(ok, depth, jnp.inf)
            # first-min argmin (matches jnp.argmin tie-breaking) without
            # relying on Mosaic argmin lowering: min depth, then min
            # chunk-index among the rows equal to it
            d_best = jnp.min(depth, axis=0)            # [sub, lpx]
            cand = jnp.where(depth == d_best[None], cidx, chunk)
            best = jnp.min(cand, axis=0)               # [sub, lpx]
            better = d_best < zbuf
            zbuf = jnp.where(better, d_best, zbuf)
            slotb = jnp.where(better, base + best, slotb)
            return zbuf, slotb

        zbuf = jnp.full((sub, lpx), jnp.inf, jnp.float32)
        slotb = jnp.full((sub, lpx), -1, jnp.int32)
        zbuf, slotb = jax.lax.fori_loop(0, n_chunks, walk, (zbuf, slotb))
        zbuf = jnp.where(jnp.isfinite(zbuf), zbuf, 1.0)
        depth_ref[b] = zbuf                            # [sub, lpx] block
        slot_ref[b] = slotb

        if resolve:
            # per-sublane-row one-hot dots: row r's slots are a [1, lpx]
            # lane vector, so the one-hot builds [128, lpx] and the
            # contraction is [C_pad, 128] x [128, lpx] — no sublane->lane
            # reshape of the slot block is ever needed
            rows_acc = []
            for r in range(sub):
                srow = slotb[r][None, :]               # [1, lpx]
                kl_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (128, lpx), 0)
                oh = (kl_iota == srow).astype(jnp.float32)
                acc = jnp.dot(tab_ref[b, :, 0:128], oh,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
                for lo in range(128, kl_pad, 128):
                    def wide_chunk(acc, lo=lo, srow=srow, b=b):
                        kli = lo + jax.lax.broadcasted_iota(
                            jnp.int32, (128, lpx), 0)
                        ohc = (kli == srow).astype(jnp.float32)
                        return acc + jnp.dot(
                            tab_ref[b, :, lo:lo + 128], ohc,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)

                    acc = jax.lax.cond(cnt > lo, wide_chunk,
                                       lambda a: a, acc)
                rows_acc.append(acc)                   # [C_pad, lpx]
            cols.append(jnp.stack(rows_acc, axis=1))   # [C_pad, sub, lpx]
    if resolve:
        res_ref[...] = jnp.stack(cols, axis=1)     # [C_pad, blk, sub, lpx]


def raster_resolve_tiles_pallas(
    counts: Array,     # i32[tiles] walked-slot count per tile
    tri_pack: Array,   # f32[tiles, K_pad, PACK_CH]
    tables_t: Array | None,   # f32[tiles, C, KL] or None (depth-only)
    px: int,
    tile_w: int,
    tiles_x: int,
    chunk: int = 8,
    tiles_blk: int = 8,
    interpret: bool = False,
):
    """-> (depth f32[tiles, px], slot i32[tiles, px],
            resolved f32[C, tiles, px] | None)."""
    n_tiles, k_pad, _ = tri_pack.shape
    resolve = tables_t is not None
    blk = min(tiles_blk, n_tiles)
    n_blocks = -(-n_tiles // blk)
    t_pad = n_blocks * blk

    cnt_p = counts.astype(jnp.int32)
    tri_p = tri_pack
    if t_pad != n_tiles:
        cnt_p = jnp.pad(cnt_p, (0, t_pad - n_tiles))
        tri_p = jnp.pad(tri_pack,
                        ((0, t_pad - n_tiles), (0, 0), (0, 0)))

    sub = 8
    lpx = px // sub
    in_specs = [
        pl.BlockSpec((blk, k_pad, PACK_CH), lambda i, c: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [tri_p]
    # depth/slot/resolved are written as [.., sub, lpx] blocks (the
    # kernel's sublane-packed pixel layout); the row-major flatten back
    # to [.., px] below is a free bitcast
    out_specs = [
        pl.BlockSpec((blk, sub, lpx), lambda i, c: (i, 0, 0)),
        pl.BlockSpec((blk, sub, lpx), lambda i, c: (i, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t_pad, sub, lpx), jnp.float32),
        jax.ShapeDtypeStruct((t_pad, sub, lpx), jnp.int32),
    ]
    kl_pad = 0
    if resolve:
        c = tables_t.shape[1]
        kl = tables_t.shape[2]
        c_pad = -(-c // 8) * 8
        kl_pad = max(128, -(-kl // 128) * 128)
        tab = jnp.zeros((t_pad, c_pad, kl_pad), jnp.float32)
        tab = tab.at[:n_tiles, :c, :kl].set(tables_t)
        in_specs.append(pl.BlockSpec((blk, c_pad, kl_pad),
                                     lambda i, cc: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(tab)
        out_specs.insert(0, pl.BlockSpec((c_pad, blk, sub, lpx),
                                         lambda i, cc: (0, i, 0, 0)))
        out_shape.insert(0,
                         jax.ShapeDtypeStruct((c_pad, t_pad, sub, lpx),
                                              jnp.float32))

    def kernel(cnts, *refs):
        if resolve:
            tri, tabr, res, dep, slot = refs
        else:
            tri, dep, slot = refs
            tabr = res = None
        _raster_resolve_kernel(
            cnts, tri, tabr, res, dep, slot, chunk=chunk, k_pad=k_pad,
            kl_pad=kl_pad, tiles_blk=blk, px=px, tile_w=tile_w,
            tiles_x=tiles_x, resolve=resolve)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(cnt_p, *operands)
    if resolve:
        res, dep, slot = outs
        return (dep.reshape(t_pad, px)[:n_tiles],
                slot.reshape(t_pad, px)[:n_tiles],
                res.reshape(res.shape[0], t_pad, px)[:tables_t.shape[1],
                                                     :n_tiles])
    dep, slot = outs
    return (dep.reshape(t_pad, px)[:n_tiles],
            slot.reshape(t_pad, px)[:n_tiles], None)


def _walk_kernel(counts_ref, tri_ref, depth_ref, slot_ref, *, chunk: int,
                 k_pad: int, tiles_blk: int, px: int, tile_w: int,
                 tiles_x: int):
    """Tile-VECTORIZED count-adaptive visibility walk (v3).

    The v2 kernel walked one tile at a time: ~30 small dependent vector
    ops per chunk left the VPU pipeline mostly empty (measured 2.8 us
    per tile-chunk vs 0.33 for the XLA scan, which fuses all 510 tiles
    into one op per chunk).  Here the whole ``tiles_blk`` block walks in
    lockstep on [blk, chunk, 8, lpx] arrays (256-vreg ops — XLA-scale),
    with the trip count adapted to the block's MAX binned count (tiles
    are row-major adjacent, so dense tiles cluster in few blocks)."""
    blk_i = pl.program_id(0)
    th = px // tile_w
    sub = 8
    lpx = px // sub

    # absolute pixel coordinates [blk, sub, lpx] from 3-D iotas (per-tile
    # origins folded in; value varies on the leading dim so no
    # sublane+lane double broadcast is ever needed)
    tb = (blk_i * tiles_blk
          + jax.lax.broadcasted_iota(jnp.int32, (tiles_blk, sub, lpx), 0))
    p = (jax.lax.broadcasted_iota(jnp.int32, (tiles_blk, sub, lpx), 1) * lpx
         + jax.lax.broadcasted_iota(jnp.int32, (tiles_blk, sub, lpx), 2))
    pxb = ((tb % tiles_x) * tile_w + p % tile_w).astype(jnp.float32) + 0.5
    pyb = ((tb // tiles_x) * th + p // tile_w).astype(jnp.float32) + 0.5
    cidx = jax.lax.broadcasted_iota(
        jnp.int32, (tiles_blk, chunk, sub, lpx), 1)

    maxcnt = counts_ref[blk_i * tiles_blk]
    for b in range(1, tiles_blk):
        maxcnt = jnp.maximum(maxcnt, counts_ref[blk_i * tiles_blk + b])
    n_chunks = jnp.minimum((maxcnt + (chunk - 1)) // chunk,
                           k_pad // chunk)

    def walk(ci, carry):
        zbuf, slotb = carry                    # [blk, sub, lpx]
        base = pl.multiple_of(ci * chunk, chunk)
        rows = tri_ref[:, pl.ds(base, chunk), :]   # [blk, chunk, PACK_CH]

        def col(j):
            # [blk, chunk] -> [blk, chunk, sub, 1]: sublane broadcast
            # first; arithmetic below broadcasts lanes only
            v = rows[:, :, j][:, :, None, None]
            return jnp.broadcast_to(v, (tiles_blk, chunk, sub, 1))

        x0, x1, x2 = col(ROW_X0), col(ROW_X1), col(ROW_X2)
        y0, y1, y2 = col(ROW_Y0), col(ROW_Y1), col(ROW_Y2)
        z0, z1, z2 = col(ROW_Z0), col(ROW_Z1), col(ROW_Z2)
        okc = col(ROW_OK)
        pxc = pxb[:, None]                     # [blk, 1, sub, lpx]
        pyc = pyb[:, None]
        # identical op sequence to raster._raster_tile chunk_depth
        e0 = (x1 - x0) * (pyc - y0) - (y1 - y0) * (pxc - x0)
        e1 = (x2 - x1) * (pyc - y1) - (y2 - y1) * (pxc - x1)
        e2 = (x0 - x2) * (pyc - y2) - (y0 - y2) * (pxc - x2)
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        pos = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
        neg = (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
        apos = area > 0
        cover = (pos & apos) | (neg & ~apos)   # select-free (i1 select
        inv_area = 1.0 / jnp.where(            # does not lower)
            jnp.abs(area) > 1e-9, area, 1e-9)
        w1 = e2 * inv_area
        w2 = e0 * inv_area
        w0 = 1.0 - w1 - w2
        depth = w0 * z0 + w1 * z1 + w2 * z2    # [blk, chunk, sub, lpx]
        ok = cover & (okc > 0.0) & (depth >= 0.0) & (depth <= 1.0)
        depth = jnp.where(ok, depth, jnp.inf)
        d_best = jnp.min(depth, axis=1)        # [blk, sub, lpx]
        cand = jnp.where(depth == d_best[:, None], cidx, chunk)
        best = jnp.min(cand, axis=1)
        better = d_best < zbuf
        zbuf = jnp.where(better, d_best, zbuf)
        slotb = jnp.where(better, base + best, slotb)
        return zbuf, slotb

    zbuf = jnp.full((tiles_blk, sub, lpx), jnp.inf, jnp.float32)
    slotb = jnp.full((tiles_blk, sub, lpx), -1, jnp.int32)
    zbuf, slotb = jax.lax.fori_loop(0, n_chunks, walk, (zbuf, slotb))
    depth_ref[...] = jnp.where(jnp.isfinite(zbuf), zbuf, 1.0)
    slot_ref[...] = slotb


def raster_walk_pallas(
    counts: Array,     # i32[tiles] walked-slot count per tile
    tri_pack: Array,   # f32[tiles, K_pad, PACK_CH]
    px: int,
    tile_w: int,
    tiles_x: int,
    chunk: int = 8,
    tiles_blk: int = 8,
    interpret: bool = False,
):
    """Visibility walk only -> (depth f32[tiles, px], slot i32[tiles, px]).

    Pairs with the standalone one-hot resolve
    (:func:`resolve_pallas.resolve_tiles_pallas_wide`) through the normal
    tiled-shade path; replaces the XLA light/heavy two-pass scan."""
    n_tiles, k_pad, _ = tri_pack.shape
    blk = min(tiles_blk, n_tiles)
    n_blocks = -(-n_tiles // blk)
    t_pad = n_blocks * blk
    sub = 8
    lpx = px // sub

    cnt_p = counts.astype(jnp.int32)
    tri_p = tri_pack
    if t_pad != n_tiles:
        cnt_p = jnp.pad(cnt_p, (0, t_pad - n_tiles))
        tri_p = jnp.pad(tri_pack,
                        ((0, t_pad - n_tiles), (0, 0), (0, 0)))

    dep, slot = pl.pallas_call(
        functools.partial(_walk_kernel, chunk=chunk, k_pad=k_pad,
                          tiles_blk=blk, px=px, tile_w=tile_w,
                          tiles_x=tiles_x),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec((blk, k_pad, PACK_CH),
                                   lambda i, c: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((blk, sub, lpx), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((blk, sub, lpx), lambda i, c: (i, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, sub, lpx), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, sub, lpx), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(cnt_p, tri_p)
    return (dep.reshape(t_pad, px)[:n_tiles],
            slot.reshape(t_pad, px)[:n_tiles])


def pack_tile_triangles(sel_ids: Array, sx: Array, sy: Array, z: Array,
                        chunk: int = 8) -> tuple[Array, int]:
    """Build the kernel's packed per-tile triangle table.

    sel_ids: i32[tiles, K] binned sub-triangle ids (-1 empty)
    sx/sy/z: f32[S, 3] per-sub-triangle screen coords / NDC depth
    -> (tri_pack f32[tiles, K_pad, PACK_CH], K_pad)

    ONE channel-major take + one transpose: gathering the [S, 3]-minor
    setup arrays directly with [tiles, K] indices makes XLA fetch a full
    lane-padded row (512 B) per element — 10 gathers x 139k rows
    measured ~11 ms/frame at 1080p.  The [9, S] super-row take fetches
    each element once.
    """
    n_tiles, k = sel_ids.shape
    k_pad = -(-k // chunk) * chunk
    safe = jnp.maximum(sel_ids, 0).reshape(-1)        # [tiles*K]
    rows = jnp.concatenate([sx.T, sy.T, z.T])         # [9, S] channel-major
    g = jax.lax.optimization_barrier(
        jnp.take(rows, safe, axis=1))                 # [9, tiles*K]
    g = g.reshape(9, n_tiles, k)
    ok = (sel_ids >= 0).astype(jnp.float32)           # [tiles, K]
    pack = jnp.concatenate([g, ok[None]], axis=0)     # [10, tiles, K]
    pack = jnp.transpose(pack, (1, 2, 0))             # [tiles, K, 10]
    pack = jnp.pad(pack, ((0, 0), (0, k_pad - k),
                          (0, PACK_CH - pack.shape[-1])))
    return pack, k_pad
