"""Clean A/B of the two deferred-shade paths + resolve isolation on chip.

Stages (each its own jit; run with nothing else on the chip):
  frame_gather — render_frame(shade_mode='gather')  (round-2 path)
  frame_tiled  — render_frame(shade_mode='tiled')   (one-hot MXU resolve)
  resolve_only — rasterize(tiled) + the one-hot resolve contraction alone

Usage: python scripts/profile_shade2.py [width] [height]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from banggameengine_tpu.render import raster as rz
from banggameengine_tpu.render.camera import Camera
from banggameengine_tpu.render.cull import entity_frustum_mask
from banggameengine_tpu.render.pipeline import render_frame
from banggameengine_tpu.render.shading import _pack_tri_rows
from banggameengine_tpu.utils.profiling import measure_throughput


def timeit(name, fn, *args, reps=15):
    sec = measure_throughput(fn, *args, calls=reps)
    print(f"{name:14s} {sec * 1e3:8.3f} ms  ({1 / sec:6.1f}/s)", flush=True)


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 1080

    from banggameengine_tpu.physics.config import load_physics_config
    from banggameengine_tpu.scene import (
        ResourceManager, build_scene, parse_scene_json,
    )

    assets = os.environ.get("BANG_ASSETS_DIR", "/root/reference/assets")
    built = build_scene(
        parse_scene_json(os.path.join(assets, "scenes/demo.json")),
        ResourceManager(assets_root=assets),
        load_physics_config(os.path.join(assets, "config/physics.json")),
    )
    rs = jax.device_put(built.render)
    cam = Camera()
    cam.position[:] = (0.0, 4.0, -10.5)
    cam.set_yaw_pitch(3.14159 / 2, -0.12)
    view = jax.device_put(jnp.asarray(cam.view_matrix()))
    proj = jax.device_put(jnp.asarray(cam.proj_matrix(width / height)))
    cam_pos = jax.device_put(jnp.asarray(cam.position))
    from banggameengine_tpu.engine import make_multi_step_fn
    from banggameengine_tpu.state import InputFrame

    settle = make_multi_step_fn(built.static, 480)
    settled = settle(jax.tree.map(jnp.array, built.initial_state),
                     InputFrame.zero())
    settled = settled[0] if isinstance(settled, tuple) else settled
    world = jax.device_put(settled.world)

    def make_frame(mode, resolve="xla"):
        import functools

        @functools.partial(jax.jit, static_argnames=())
        def f(r, w):
            return render_frame(r, w, view, proj, cam_pos,
                                width=width, height=height,
                                bin_capacity=2048, shade_mode=mode,
                                resolve_backend=resolve)
        return f

    @jax.jit
    def resolve_only(r, wm):
        vis_ent = entity_frustum_mask(
            r.ent_aabb_min, r.ent_aabb_max, r.ent_has_mesh, wm, view, proj)
        tri_valid = r.tri_valid & vis_ent[r.v_entity[::3]]
        world_pos, clip = rz.transform_vertices(
            r.v_pos, r.v_entity, wm, view, proj)
        _, _, tiled = rz.rasterize(clip, tri_valid, width, height,
                                   bin_capacity=2048, return_tiled=True)
        from banggameengine_tpu import math3d
        nm = math3d.normal_matrix(wm)
        world_nrm = rz.transform_normals(r.v_nrm, r.v_entity, nm)
        inv_w = 1.0 / jnp.where(jnp.abs(clip[:, 3]) > 1e-9, clip[:, 3], 1e-9)
        tri_row_t, _ = _pack_tri_rows(
            world_pos, world_nrm, r.v_uv, inv_w, r.tri_material,
            r.mat_base_tint, r.mat_uv_scale, r.mat_spec_color, r.mat_tex,
            r.tex_size, True)
        kl = 64
        n_tiles = tiled.slot.shape[0]
        px = tiled.slot.shape[1] * tiled.slot.shape[2]
        tables = tri_row_t.T[jnp.maximum(tiled.ids[:, :kl], 0) // 2]
        slot_p = tiled.slot.reshape(n_tiles, px)
        oh = (slot_p[..., None] == jnp.arange(kl)[None, None, :]).astype(
            jnp.float32)
        resolved = jax.lax.dot_general(
            jnp.swapaxes(tables, 1, 2), oh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return resolved.sum((0, 2))

    timeit("frame_tiled", make_frame("tiled"), rs, world)
    timeit("tiled_pallas", make_frame("tiled", resolve="pallas"), rs, world)
    timeit("frame_gather", make_frame("gather"), rs, world)


if __name__ == "__main__":
    main()
