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


def timeit(name, fn, *args, reps=10):
    """Queued-dispatch throughput with ONE final readback: per-call
    ``block_until_ready`` does not synchronize on tunneled runtimes."""
    from banggameengine_tpu.utils.profiling import measure_throughput

    sec = measure_throughput(fn, *args, calls=reps)
    med = sec * 1e3
    print(f"{name:10s} {med:8.3f} ms  ({1e3 / med:6.1f} /s)", flush=True)
    return fn(*args), med


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
    # device-resident args: a real frame loop keeps these on device, and
    # numpy args would otherwise pay a host->device upload round-trip per
    # timed call (dominates at tunnel latencies)
    view = jax.device_put(jnp.asarray(cam.view_matrix()))
    proj = jax.device_put(jnp.asarray(cam.proj_matrix(width / height)))
    cam_pos = jax.device_put(jnp.asarray(cam.position))
    world = jax.device_put(world)
    light = jax.tree.map(jax.device_put, LightParams.default())
    # every jitted stage takes the render scene as an ARGUMENT: captured
    # arrays embed as executable constants, which cost a flat ~32 ms host
    # round-trip per call on the tunneled runtime (find_constants.py)
    rs_dev = jax.device_put(rs)

    @jax.jit
    def stage_bin(r, world_mats):
        vis_ent = entity_frustum_mask(
            r.ent_aabb_min, r.ent_aabb_max, r.ent_has_mesh,
            world_mats, view, proj)
        tri_entity = r.v_entity[::3]
        tri_valid = r.tri_valid & vis_ent[tri_entity]
        world_pos, clip = rz.transform_vertices(
            r.v_pos, r.v_entity, world_mats, view, proj)
        t = clip.shape[0] // 3
        clip_tri = clip.reshape(t, 3, 4)
        sub_clip, sub_bary, sub_valid = rz.clip_near_plane(clip_tri, tri_valid)
        s = 2 * t
        tri = rz.setup_triangles(
            sub_clip.reshape(s, 3, 4), sub_valid.reshape(s), width, height)
        rw = width + (-width) % rz.TILE_W
        rh = height + (-height) % rz.TILE_H
        ids, counts, _local_counts, overflow, _ = rz.bin_triangles(
            tri, rw, rh, k_local=min(2048, 2 * t))
        return counts, overflow

    def make_raster(heavy):
        @jax.jit
        def f(r, world_mats):
            vis_ent = entity_frustum_mask(
                r.ent_aabb_min, r.ent_aabb_max, r.ent_has_mesh,
                world_mats, view, proj)
            tri_entity = r.v_entity[::3]
            tri_valid = r.tri_valid & vis_ent[tri_entity]
            _, clip = rz.transform_vertices(
                r.v_pos, r.v_entity, world_mats, view, proj)
            vis, ovf = rz.rasterize(clip, tri_valid, width, height,
                                    bin_capacity=2048, heavy_tiles=heavy)
            return vis.depth
        return f

    (counts, ovf), _ = timeit("bin", stage_bin, rs_dev, world)
    import numpy as np
    c = np.asarray(counts)
    print(f"   tiles={c.size} max_count={c.max()} "
          f">128: {(c > 128).sum()}  overflow={int(ovf)}")
    timeit("light", make_raster(0), rs_dev, world)
    timeit("full_vis", make_raster(64), rs_dev, world)

    depth_fn = make_render_fn(rs, width, height, bin_capacity=2048,
                              depth_only=True)
    _, t_depth = timeit("depth", depth_fn, world, view, proj,
                        cam_pos)

    # fixed visibility buffer for shading isolation
    @jax.jit
    def vis_and_attrs(r, world_mats):
        _, clip = rz.transform_vertices(
            r.v_pos, r.v_entity, world_mats, view, proj)
        vis_ent = entity_frustum_mask(
            r.ent_aabb_min, r.ent_aabb_max, r.ent_has_mesh,
            world_mats, view, proj)
        tri_valid = r.tri_valid & vis_ent[r.v_entity[::3]]
        vis, _ = rz.rasterize(clip, tri_valid, width, height,
                              bin_capacity=2048)
        world_pos, _ = rz.transform_vertices(
            r.v_pos, r.v_entity, world_mats, view, proj)
        nm = math3d.normal_matrix(world_mats)
        world_nrm = rz.transform_normals(r.v_nrm, r.v_entity, nm)
        inv_w = 1.0 / jnp.where(jnp.abs(clip[:, 3]) > 1e-9, clip[:, 3], 1e-9)
        return vis, world_pos, world_nrm, inv_w

    vis, world_pos, world_nrm, inv_w = jax.block_until_ready(
        vis_and_attrs(rs_dev, world))

    @jax.jit
    def stage_shade(r, tri_id, b1, b2, depth, wp, wn, iw):
        return shade_visibility(
            tri_id, b1, b2, wp, wn, r.v_uv, iw, r.tri_material,
            r.mat_base_tint, r.mat_uv_scale, r.mat_spec_params,
            r.mat_spec_color, r.mat_tex, r.textures, r.tex_size,
            cam_pos, light,
            textures_quad=getattr(r, "textures_quad", None),
            textures_quad_t=getattr(r, "textures_quad_t", None),
            vis_depth=depth, view=view, proj=proj)

    timeit("shade", stage_shade, rs_dev, vis.tri_id, vis.b1, vis.b2,
           vis.depth, world_pos, world_nrm, inv_w)

    frame_fn = make_render_fn(rs, width, height, bin_capacity=2048)
    _, t_frame = timeit("frame", frame_fn, world, view, proj,
                        cam_pos)
    print(f"depth fps {1e3 / t_depth:.1f}   frame fps {1e3 / t_frame:.1f}")


if __name__ == "__main__":
    main()
