"""Stage timing of the 1080p render pipeline on the real chip.

Times, per stage (each its own jit; real demo assets):
  bin      — transform + near clip + setup + binning (no raster)
  light    — + light raster pass (heavy_tiles=0)
  full_vis — + heavy pass (= complete visibility buffer)
  depth    — the shipping depth_only render
  shade    — shade_visibility alone on a fixed visibility buffer
  frame    — the shipping full shaded render

Usage: python scripts/profile_render.py [width] [height]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from banggameengine_tpu import math3d
from banggameengine_tpu.render import raster as rz
from banggameengine_tpu.render.camera import Camera
from banggameengine_tpu.render.cull import entity_frustum_mask
from banggameengine_tpu.render.pipeline import make_render_fn
from banggameengine_tpu.render.shading import LightParams, shade_visibility


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2] * 1e3
    print(f"{name:10s} {med:8.3f} ms  ({1e3 / med:6.1f} /s)")
    return out, med


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 1080

    from banggameengine_tpu.physics.config import load_physics_config
    from banggameengine_tpu.scene import (
        ResourceManager, build_scene, parse_scene_json,
    )

    assets = os.environ.get("BANG_ASSETS_DIR", "/root/reference/assets")
    desc = parse_scene_json(os.path.join(assets, "scenes/demo.json"))
    built = build_scene(
        desc, ResourceManager(assets_root=assets),
        load_physics_config(os.path.join(assets, "config/physics.json")),
    )
    rs, world = built.render, built.initial_state.world

    cam = Camera()
    cam.position[:] = (0.0, 4.0, -10.5)
    cam.set_yaw_pitch(3.14159 / 2, -0.12)
    view = cam.view_matrix()
    proj = cam.proj_matrix(width / height)
    cam_pos = jnp.asarray(cam.position)
    light = LightParams.default()

    @jax.jit
    def stage_bin(world_mats):
        vis_ent = entity_frustum_mask(
            rs.ent_aabb_min, rs.ent_aabb_max, rs.ent_has_mesh,
            world_mats, view, proj)
        tri_entity = rs.v_entity[::3]
        tri_valid = rs.tri_valid & vis_ent[tri_entity]
        world_pos, clip = rz.transform_vertices(
            rs.v_pos, rs.v_entity, world_mats, view, proj)
        t = clip.shape[0] // 3
        clip_tri = clip.reshape(t, 3, 4)
        sub_clip, sub_bary, sub_valid = rz.clip_near_plane(clip_tri, tri_valid)
        s = 2 * t
        tri = rz.setup_triangles(
            sub_clip.reshape(s, 3, 4), sub_valid.reshape(s), width, height)
        rw = width + (-width) % rz.TILE_W
        rh = height + (-height) % rz.TILE_H
        ids, counts, overflow, _ = rz.bin_triangles(
            tri, rw, rh, k_local=min(2048, 2 * t))
        return counts, overflow

    def make_raster(heavy):
        @jax.jit
        def f(world_mats):
            vis_ent = entity_frustum_mask(
                rs.ent_aabb_min, rs.ent_aabb_max, rs.ent_has_mesh,
                world_mats, view, proj)
            tri_entity = rs.v_entity[::3]
            tri_valid = rs.tri_valid & vis_ent[tri_entity]
            _, clip = rz.transform_vertices(
                rs.v_pos, rs.v_entity, world_mats, view, proj)
            vis, ovf = rz.rasterize(clip, tri_valid, width, height,
                                    bin_capacity=2048, heavy_tiles=heavy)
            return vis.depth
        return f

    (counts, ovf), _ = timeit("bin", stage_bin, world.world_mat)
    import numpy as np
    c = np.asarray(counts)
    print(f"   tiles={c.size} max_count={c.max()} "
          f">128: {(c > 128).sum()}  overflow={int(ovf)}")
    timeit("light", make_raster(0), world.world_mat)
    timeit("full_vis", make_raster(64), world.world_mat)

    depth_fn = make_render_fn(rs, width, height, bin_capacity=2048,
                              depth_only=True)
    _, t_depth = timeit("depth", depth_fn, world.world_mat, view, proj,
                        cam_pos)

    # fixed visibility buffer for shading isolation
    @jax.jit
    def vis_and_attrs(world_mats):
        _, clip = rz.transform_vertices(
            rs.v_pos, rs.v_entity, world_mats, view, proj)
        vis_ent = entity_frustum_mask(
            rs.ent_aabb_min, rs.ent_aabb_max, rs.ent_has_mesh,
            world_mats, view, proj)
        tri_valid = rs.tri_valid & vis_ent[rs.v_entity[::3]]
        vis, _ = rz.rasterize(clip, tri_valid, width, height,
                              bin_capacity=2048)
        world_pos, _ = rz.transform_vertices(
            rs.v_pos, rs.v_entity, world_mats, view, proj)
        nm = math3d.normal_matrix(world_mats)
        world_nrm = rz.transform_normals(rs.v_nrm, rs.v_entity, nm)
        inv_w = 1.0 / jnp.where(jnp.abs(clip[:, 3]) > 1e-9, clip[:, 3], 1e-9)
        return vis, world_pos, world_nrm, inv_w

    vis, world_pos, world_nrm, inv_w = jax.block_until_ready(
        vis_and_attrs(world.world_mat))

    @jax.jit
    def stage_shade(tri_id, bary, wp, wn, iw):
        return shade_visibility(
            tri_id, bary, wp, wn, rs.v_uv, iw, rs.tri_material,
            rs.mat_base_tint, rs.mat_uv_scale, rs.mat_spec_params,
            rs.mat_spec_color, rs.mat_tex, rs.textures, rs.tex_size,
            cam_pos, light,
            textures_quad=getattr(rs, "textures_quad", None))

    timeit("shade", stage_shade, vis.tri_id, vis.bary, world_pos,
           world_nrm, inv_w)

    frame_fn = make_render_fn(rs, width, height, bin_capacity=2048)
    _, t_frame = timeit("frame", frame_fn, world.world_mat, view, proj,
                        cam_pos)
    print(f"depth fps {1e3 / t_depth:.1f}   frame fps {1e3 / t_frame:.1f}")


if __name__ == "__main__":
    main()
