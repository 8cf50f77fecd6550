"""TPU tile rasterizer: vertex transform, binning, visibility buffer.

Replaces the reference's bgfx GPU submission path (``Renderer.cpp:601-730``
per-submesh draws into a D3D11 device) with a software raster pipeline shaped
for the TPU's dense vector units (SURVEY.md §7 "Rasterization on TPU"):

1. **vertex transform** — one batched matmul over all scene vertices
   (world gathered per vertex from the entity table);
2. **triangle setup + cull** — screen-space bbox, w>0, degenerate and
   off-screen rejection; rendering is two-sided (the reference's
   ``m_defaultState`` sets no cull flag, ``Renderer.h:128-131``), depth test
   LESS with clear depth 1.0 (``Renderer.cpp:161``);
3. **binning** — per-tile triangle lists (capacity K) built from a dense
   [tiles, tris] bbox-overlap mask with a stable argsort compaction — no
   scatter;
4. **visibility pass** — per tile, a ``lax.scan`` over triangle chunks
   evaluates edge functions over the whole pixel block at once (VPU-shaped
   [chunk, th, tw] ops), z-tests, and keeps the winning triangle id +
   barycentrics per pixel ("visibility buffer");
5. shading happens once per pixel in :mod:`banggameengine_tpu.render.shading`
   (deferred), so the expensive material math never runs on occluded
   fragments.

Depth is NDC z in [0,1] interpolated linearly in screen space (matching
hardware rasterizers); attribute interpolation is perspective-correct via
1/w weighting at shade time.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

TILE_H = 32
TILE_W = 128


class VisibilityBuffer(NamedTuple):
    depth: Array    # f32[H,W], 1.0 = far/background
    tri_id: Array   # i32[H,W], -1 = background
    bary: Array     # f32[H,W,2] (b1, b2) screen-space barycentrics


def transform_vertices(v_pos, v_entity, world_mats, view, proj):
    """Object-space vertices -> (world_pos [V,3], clip [V,4]).

    One gather + one fused matmul chain; the MXU sees [V,4]x[4,4].
    """
    w = world_mats[v_entity]                          # [V,4,4]
    wp = jnp.einsum("vij,vj->vi", w[:, :3, :3], v_pos) + w[:, :3, 3]
    vp = jnp.matmul(proj, view, preferred_element_type=jnp.float32)
    wp4 = jnp.concatenate([wp, jnp.ones_like(wp[:, :1])], axis=-1)
    clip = jnp.einsum("ij,vj->vi", vp, wp4)
    return wp, clip


def transform_normals(v_nrm, v_entity, normal_mats):
    nm = normal_mats[v_entity]                        # [V,3,3]
    n = jnp.einsum("vij,vj->vi", nm, v_nrm)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)


def clip_near_plane(clip_tri: Array, tri_valid: Array):
    """Clip triangles against the near plane (clip-space z >= 0).

    Each input triangle yields up to 2 sub-triangles.  Sub-triangle corners
    carry their barycentric coordinates **in the original triangle**, so the
    visibility buffer keeps referencing original triangle ids and original
    vertex attributes — clipping is invisible to the deferred shader.

    clip_tri: f32[T, 3, 4]; returns (sub_clip f32[T,2,3,4],
    sub_bary f32[T,2,3,3] rows = original-space barycentrics of each corner,
    sub_valid bool[T,2]).
    """
    d = clip_tri[..., 2]                   # z_clip; >= 0 means in front
    inside = d >= 0.0
    k = jnp.sum(inside, axis=1)            # [T] 0..3

    # rotate so that: k==1 -> the inside vertex is slot 0;
    #                 k==2 -> the outside vertex is slot 2
    r1 = jnp.argmax(inside, axis=1)
    r2 = jnp.mod(jnp.argmax(~inside, axis=1) + 1, 3)
    r = jnp.where(k == 1, r1, jnp.where(k == 2, r2, 0)).astype(jnp.int32)

    idx = jnp.mod(r[:, None] + jnp.arange(3)[None, :], 3)      # [T,3]
    v = jnp.take_along_axis(clip_tri, idx[..., None], axis=1)   # rotated verts
    dd = jnp.take_along_axis(d, idx, axis=1)
    bary_id = jax.nn.one_hot(idx, 3, dtype=clip_tri.dtype)      # [T,3,3]

    def lerp(a, b, t):
        return a + (b - a) * t[..., None]

    def safe_t(da, db):
        den = da - db
        return da / jnp.where(jnp.abs(den) > 1e-12, den, 1e-12)

    d0, d1, d2 = dd[:, 0], dd[:, 1], dd[:, 2]
    v0, v1, v2 = v[:, 0], v[:, 1], v[:, 2]
    b0, b1, b2 = bary_id[:, 0], bary_id[:, 1], bary_id[:, 2]

    i01 = lerp(v0, v1, safe_t(d0, d1))
    i02 = lerp(v0, v2, safe_t(d0, d2))
    i12 = lerp(v1, v2, safe_t(d1, d2))
    bi01 = lerp(b0, b1, safe_t(d0, d1))
    bi02 = lerp(b0, b2, safe_t(d0, d2))
    bi12 = lerp(b1, b2, safe_t(d1, d2))

    k1 = (k == 1)[:, None, None]
    k2 = (k == 2)[:, None, None]
    k3 = (k == 3)[:, None, None]

    # sub-triangle 1: k3 -> (v0,v1,v2); k2 -> (v0,v1,i12); k1 -> (v0,i01,i02)
    s1_v = jnp.where(
        k3, v, jnp.where(
            k2, jnp.stack([v0, v1, i12], 1), jnp.stack([v0, i01, i02], 1))
    )
    s1_b = jnp.where(
        k3, bary_id, jnp.where(
            k2, jnp.stack([b0, b1, bi12], 1), jnp.stack([b0, bi01, bi02], 1))
    )
    # sub-triangle 2: only k2 -> (v0, i12, i02)
    s2_v = jnp.stack([v0, i12, i02], 1)
    s2_b = jnp.stack([b0, bi12, bi02], 1)

    sub_clip = jnp.stack([s1_v, s2_v], axis=1)          # [T,2,3,4]
    sub_bary = jnp.stack([s1_b, s2_b], axis=1)
    s1_ok = tri_valid & (k >= 1)
    s2_ok = tri_valid & (k == 2)
    sub_valid = jnp.stack([s1_ok, s2_ok], axis=1)
    return sub_clip, sub_bary, sub_valid


def setup_triangles(sub_clip, sub_valid, width: int, height: int):
    """Near-clipped sub-triangles -> screen-space raster data.

    sub_clip: f32[S, 3, 4] (S = 2T flattened sub-triangles, all z >= 0 by
    construction); returns dict of per-sub-tri arrays.
    """
    w = sub_clip[..., 3]
    safe_w = jnp.where(jnp.abs(w) > 1e-9, w, 1e-9)
    ndc = sub_clip[..., :3] / safe_w[..., None]
    sx3 = (ndc[..., 0] * 0.5 + 0.5) * width
    sy3 = (1.0 - (ndc[..., 1] * 0.5 + 0.5)) * height
    z3 = ndc[..., 2]
    iw3 = 1.0 / safe_w

    in_front = jnp.all(w > 1e-7, axis=1)
    x0 = jnp.min(sx3, axis=1)
    x1 = jnp.max(sx3, axis=1)
    y0 = jnp.min(sy3, axis=1)
    y1 = jnp.max(sy3, axis=1)
    on_screen = (x1 >= 0) & (x0 < width) & (y1 >= 0) & (y0 < height)
    area = (sx3[:, 1] - sx3[:, 0]) * (sy3[:, 2] - sy3[:, 0]) - (
        sy3[:, 1] - sy3[:, 0]
    ) * (sx3[:, 2] - sx3[:, 0])
    nondegenerate = jnp.abs(area) > 1e-9
    # far-plane handled per-pixel (depth <= 1 test in the tile kernel)
    valid = sub_valid & in_front & on_screen & nondegenerate

    return dict(
        sx=sx3, sy=sy3, z=z3, inv_w=iw3, area=area,
        bbox=jnp.stack([x0, y0, x1, y1], axis=1), valid=valid,
    )


def bin_triangles(tri, width: int, height: int, bin_capacity: int):
    """Dense bbox-vs-tile binning.

    Returns (tile_tris i32[tiles, K] triangle ids, -1 padded; counts
    i32[tiles]; overflow i32 — (tile, tri) pairs dropped beyond K).
    Tiles are row-major over a [tiles_y, tiles_x] grid.
    """
    tiles_x = (width + TILE_W - 1) // TILE_W
    tiles_y = (height + TILE_H - 1) // TILE_H
    t = tri["valid"].shape[0]

    tx = jnp.arange(tiles_x, dtype=jnp.float32) * TILE_W
    ty = jnp.arange(tiles_y, dtype=jnp.float32) * TILE_H
    tile_x0 = jnp.tile(tx, tiles_y)                  # [tiles]
    tile_y0 = jnp.repeat(ty, tiles_x)

    bbox = tri["bbox"]
    ov = (
        (bbox[None, :, 0] <= tile_x0[:, None] + TILE_W)
        & (bbox[None, :, 2] >= tile_x0[:, None])
        & (bbox[None, :, 1] <= tile_y0[:, None] + TILE_H)
        & (bbox[None, :, 3] >= tile_y0[:, None])
        & tri["valid"][None, :]
    )                                                # [tiles, T]

    # stable compaction: argsort(~mask) puts overlapping tri ids first in
    # ascending order (deterministic draw order)
    order = jnp.argsort(~ov, axis=1, stable=True)    # [tiles, T]
    k = min(bin_capacity, t)
    ids = order[:, :k].astype(jnp.int32)
    counts = jnp.sum(ov, axis=1)
    slot = jnp.arange(k)[None, :]
    ids = jnp.where(slot < counts[:, None], ids, -1)
    overflow = jnp.sum(jnp.maximum(counts - k, 0))
    return ids, counts, overflow, (tiles_y, tiles_x)


def _raster_tile(tile_ids, tile_x0, tile_y0, sx, sy, z, orig_id, corner_bary,
                 chunk: int):
    """Visibility raster of one tile over sub-triangles.

    tile_ids i32[K] (-1 pad) index sub-triangles; the output tri_id buffer
    stores ``orig_id`` and the barycentrics are mapped into original-triangle
    space through ``corner_bary`` [S,3,3].
    """
    k = tile_ids.shape[0]
    px = tile_x0 + jnp.arange(TILE_W, dtype=jnp.float32)[None, :] + 0.5
    py = tile_y0 + jnp.arange(TILE_H, dtype=jnp.float32)[:, None] + 0.5

    def chunk_body(carry, cids):
        zbuf, tid, b1b, b2b = carry
        safe = jnp.maximum(cids, 0)
        x = sx[safe]                                  # [C,3]
        y = sy[safe]
        zz = z[safe]
        cb = corner_bary[safe]                        # [C,3,3]
        oid = orig_id[safe]
        x0, x1, x2 = x[:, 0, None, None], x[:, 1, None, None], x[:, 2, None, None]
        y0, y1, y2 = y[:, 0, None, None], y[:, 1, None, None], y[:, 2, None, None]
        pxb = px[None]                                # [1,TH,TW]
        pyb = py[None]
        # edge functions (signed areas)
        e0 = (x1 - x0) * (pyb - y0) - (y1 - y0) * (pxb - x0)
        e1 = (x2 - x1) * (pyb - y1) - (y2 - y1) * (pxb - x1)
        e2 = (x0 - x2) * (pyb - y2) - (y0 - y2) * (pxb - x2)
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)  # [C,1,1]
        # two-sided coverage
        pos = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
        neg = (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
        cover = jnp.where(area > 0, pos, neg)
        inv_area = 1.0 / jnp.where(jnp.abs(area) > 1e-9, area, 1e-9)
        b1 = e2 * inv_area                            # weight of vertex 1
        b2 = e0 * inv_area                            # weight of vertex 2
        b0 = 1.0 - b1 - b2
        depth = (
            b0 * zz[:, 0, None, None]
            + b1 * zz[:, 1, None, None]
            + b2 * zz[:, 2, None, None]
        )
        ok = cover & (cids >= 0)[:, None, None] & (depth >= 0.0) & (depth <= 1.0)
        depth = jnp.where(ok, depth, jnp.inf)
        # map sub-space bary -> original-triangle bary
        ob = (
            b0[..., None] * cb[:, None, None, 0]
            + b1[..., None] * cb[:, None, None, 1]
            + b2[..., None] * cb[:, None, None, 2]
        )                                             # [C,TH,TW,3]
        # best in chunk
        best = jnp.argmin(depth, axis=0)              # [TH,TW]
        take = functools.partial(jnp.take_along_axis, indices=best[None], axis=0)
        d_best = take(depth)[0]
        b1_best = jnp.take_along_axis(ob[..., 1], best[None], axis=0)[0]
        b2_best = jnp.take_along_axis(ob[..., 2], best[None], axis=0)[0]
        id_best = oid[best]
        better = d_best < zbuf
        zbuf = jnp.where(better, d_best, zbuf)
        tid = jnp.where(better, id_best, tid)
        b1b = jnp.where(better, b1_best, b1b)
        b2b = jnp.where(better, b2_best, b2b)
        return (zbuf, tid, b1b, b2b), None

    init = (
        jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32),
        jnp.full((TILE_H, TILE_W), -1, jnp.int32),
        jnp.zeros((TILE_H, TILE_W), jnp.float32),
        jnp.zeros((TILE_H, TILE_W), jnp.float32),
    )
    chunks = tile_ids.reshape(k // chunk, chunk)
    (zbuf, tid, b1b, b2b), _ = jax.lax.scan(chunk_body, init, chunks)
    zbuf = jnp.where(jnp.isfinite(zbuf), zbuf, 1.0)
    return zbuf, tid, b1b, b2b


def rasterize(clip, tri_valid, width: int, height: int,
              bin_capacity: int = 2048, chunk: int = 8,
              light_capacity: int = 64, heavy_tiles: int = 64,
              ) -> tuple[VisibilityBuffer, Array]:
    """Full visibility pass.  width/height are padded up to tile multiples
    internally; outputs are cropped back.  Returns (vis, bin_overflow).

    **Light/heavy split**: triangle density per tile is highly skewed (a
    detailed mesh concentrates thousands of triangles in a few tiles while
    most tiles hold a handful).  All tiles raster their first
    ``light_capacity`` triangles; the ``heavy_tiles`` fullest tiles are
    re-rastered with the full ``bin_capacity`` and overwrite their light
    results.  This keeps per-frame work at
    ``tiles*light + heavy_tiles*bin_capacity`` triangle-tile evaluations
    instead of ``tiles*bin_capacity``."""
    pad_w = (-width) % TILE_W
    pad_h = (-height) % TILE_H
    rw, rh = width + pad_w, height + pad_h

    # near-plane clip: T triangles -> 2T sub-triangles with original-space
    # corner barycentrics
    t = clip.shape[0] // 3
    clip_tri = clip.reshape(t, 3, 4)
    sub_clip, sub_bary, sub_valid = clip_near_plane(clip_tri, tri_valid)
    s = 2 * t
    sub_clip = sub_clip.reshape(s, 3, 4)
    sub_bary = sub_bary.reshape(s, 3, 3)
    sub_valid = sub_valid.reshape(s)
    orig_id = jnp.repeat(jnp.arange(t, dtype=jnp.int32), 2)

    # screen mapping uses the TRUE resolution; the tile grid just extends
    # past the right/bottom edges into cropped padding
    tri = setup_triangles(sub_clip, sub_valid, width, height)
    ids, counts, overflow, (tiles_y, tiles_x) = bin_triangles(
        tri, rw, rh, bin_capacity
    )
    n_tiles = ids.shape[0]

    def pad_chunk(a):
        pad_k = (-a.shape[1]) % chunk
        if pad_k:
            a = jnp.concatenate(
                [a, jnp.full((a.shape[0], pad_k), -1, jnp.int32)], axis=1
            )
        return a

    tx = jnp.tile(jnp.arange(tiles_x, dtype=jnp.float32) * TILE_W, tiles_y)
    ty = jnp.repeat(jnp.arange(tiles_y, dtype=jnp.float32) * TILE_H, tiles_x)

    raster = jax.vmap(
        lambda i, x0, y0: _raster_tile(
            i, x0, y0, tri["sx"], tri["sy"], tri["z"], orig_id, sub_bary, chunk
        )
    )

    # light pass: every tile, first light_capacity triangles
    kl = min(light_capacity, ids.shape[1])
    zb, tid, b1, b2 = raster(pad_chunk(ids[:, :kl]), tx, ty)

    # heavy pass: fullest tiles re-rastered at full capacity
    h = min(heavy_tiles, n_tiles)
    if ids.shape[1] > kl and h > 0:
        heavy_sel = jax.lax.top_k(counts, h)[1]      # tile indices
        zb_h, tid_h, b1_h, b2_h = raster(
            pad_chunk(ids[heavy_sel]), tx[heavy_sel], ty[heavy_sel]
        )
        # only overwrite tiles that actually exceeded the light capacity
        needs = (counts[heavy_sel] > kl)[:, None, None]
        zb = zb.at[heavy_sel].set(jnp.where(needs, zb_h, zb[heavy_sel]))
        tid = tid.at[heavy_sel].set(jnp.where(needs, tid_h, tid[heavy_sel]))
        b1 = b1.at[heavy_sel].set(jnp.where(needs, b1_h, b1[heavy_sel]))
        b2 = b2.at[heavy_sel].set(jnp.where(needs, b2_h, b2[heavy_sel]))
        # light-capacity overflow not covered by the heavy pass
        over_light = jnp.maximum(counts - kl, 0).sum() - jnp.maximum(
            counts[heavy_sel] - kl, 0
        ).sum()
        overflow = overflow + over_light

    def untile(a):
        a = a.reshape(tiles_y, tiles_x, TILE_H, TILE_W)
        a = jnp.transpose(a, (0, 2, 1, 3)).reshape(rh, rw)
        return a[:height, :width]

    vis = VisibilityBuffer(
        depth=untile(zb),
        tri_id=untile(tid),
        bary=jnp.stack([untile(b1), untile(b2)], axis=-1),
    )
    return vis, overflow
