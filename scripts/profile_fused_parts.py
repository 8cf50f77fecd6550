"""Isolate the fused raster+resolve kernel's cost components on chip.

Variants (1080p settled demo):
  prep        — clip/setup/bin/pack only (XLA front end)
  kernel_d    — fused kernel, raster walk only (no tables)
  kernel_full — fused kernel, walk + one-hot resolve
  xla_depth   — XLA slim raster (reference)
Also prints walked-chunk statistics (what the count-adaptive walk pays).

Usage: python scripts/profile_fused_parts.py [chunk] [tiles_blk]
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from banggameengine_tpu.engine import make_multi_step_fn
from banggameengine_tpu.render.camera import Camera
from banggameengine_tpu.render import raster as rz
from banggameengine_tpu.render.cull import entity_frustum_mask
from banggameengine_tpu.render.raster_resolve_pallas import (
    raster_resolve_tiles_pallas,
)
from banggameengine_tpu.state import InputFrame
from banggameengine_tpu.utils.profiling import measure_throughput

sys.path.insert(0, "/root/repo")
from bench import _load_built_demo

W, H = 1920, 1080


def main():
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    blk = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    built = _load_built_demo()
    cam = Camera()
    cam.position[:] = (0.0, 4.0, -10.5)
    cam.set_yaw_pitch(3.14159 / 2, -0.12)
    settle = make_multi_step_fn(built.static, 480)
    settled = settle(jax.tree.map(jnp.array, built.initial_state),
                     InputFrame.zero())
    settled = settled[0] if isinstance(settled, tuple) else settled
    rs = jax.device_put(built.render)
    world = jax.device_put(settled.world)
    view = jax.device_put(jnp.asarray(cam.view_matrix()))
    proj = jax.device_put(jnp.asarray(cam.proj_matrix(W / H)))

    def clip_valid(world, view, proj):
        vis_ent = entity_frustum_mask(
            rs.ent_aabb_min, rs.ent_aabb_max, rs.ent_has_mesh,
            world, view, proj)
        tri_valid = rs.tri_valid & vis_ent[rs.v_entity[::3]]
        _, clip = rz.transform_vertices(
            rs.v_pos, rs.v_entity, world, view, proj)
        return clip, tri_valid

    prep_fn = jax.jit(lambda world, view, proj: rz.prepare_fused_raster(
        *clip_valid(world, view, proj), W, H, bin_capacity=2048,
        chunk=chunk))
    t = measure_throughput(prep_fn, world, view, proj, calls=10, warmup=2)
    print(f"prep         {t*1e3:8.3f} ms", flush=True)

    prep = prep_fn(world, view, proj)
    cnts = np.asarray(prep.counts_walk)
    ch = np.ceil(cnts / chunk)
    print(f"  walked chunks: total {int(ch.sum())}, mean {ch.mean():.1f}, "
          f"max {int(ch.max())}  (XLA light+heavy = "
          f"{cnts.shape[0]}*{(rz.K_GLOBAL+48)//chunk} + 64*"
          f"{(rz.K_GLOBAL+256)//chunk})")

    kd = jax.jit(functools.partial(
        raster_resolve_tiles_pallas, px=rz.TILE_H * rz.TILE_W,
        tile_w=rz.TILE_W, tiles_x=int(prep.tiles_x), chunk=chunk,
        tiles_blk=blk, tables_t=None))
    t = measure_throughput(kd, prep.counts_walk, prep.tri_pack,
                           calls=10, warmup=2)
    print(f"kernel_d     {t*1e3:8.3f} ms", flush=True)

    # full resolve tables at the walk width (random payload is fine for
    # timing; C matches the shade channel count 28+12)
    kw = prep.ids_w.shape[1]
    n_tiles = prep.tri_pack.shape[0]
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((n_tiles, 40, kw)), jnp.float32)
    kf = jax.jit(functools.partial(
        raster_resolve_tiles_pallas, px=rz.TILE_H * rz.TILE_W,
        tile_w=rz.TILE_W, tiles_x=int(prep.tiles_x), chunk=chunk,
        tiles_blk=blk))
    t = measure_throughput(kf, prep.counts_walk, prep.tri_pack, tab,
                           calls=10, warmup=2)
    print(f"kernel_full  {t*1e3:8.3f} ms", flush=True)

    xd = jax.jit(lambda world, view, proj: rz.rasterize(
        *clip_valid(world, view, proj), W, H, bin_capacity=2048,
        slim=True)[0].depth)
    t = measure_throughput(xd, world, view, proj, calls=10, warmup=2)
    print(f"xla_depth    {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
