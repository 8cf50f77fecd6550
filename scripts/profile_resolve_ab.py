"""Isolate the tiled-shade cost stack on chip.

Round-4 finding: ``frame_tiled`` measured 104.8 ms vs ``frame_gather``
22.8 ms on the settled demo world — the opposite of the round-3 instant-0
measurements.  Hypotheses to separate:
  (a) the heavy-fallback ``lax.cond`` fires on every settled frame (the
      character mesh always overflows the light list) and its multi-dim
      ``jnp.take`` lowers to a pathological gather;
  (b) the one-hot materialization / batched dot itself is slow;
  (c) the [t,C,px] -> [C,t,px] relayout.

Stages (each its own jit over the SAME settled world):
  raster_slim    — slim visibility raster only (depth+slot)
  raster_full    — full 5-plane carry raster only
  resolve_xla    — raster_slim + XLA f32 one-hot resolve (sum-reduced)
  resolve_bf16   — same with a bf16 one-hot + per-operand precision
  resolve_nofb   — resolve_xla with shade_slots=272 (no fallback branch)
  fb_gather      — raster_slim + ONLY the fallback-style multi-dim take
  shade_tiled    — full tiled shade (what the pipeline would run)
  shade_gather   — full gather shade (current default)

Usage: python scripts/profile_resolve_ab.py [width] [height]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from banggameengine_tpu import math3d
from banggameengine_tpu.render import raster as rz
from banggameengine_tpu.render.cull import entity_frustum_mask
from banggameengine_tpu.render.shading import (
    LightParams, _pack_tri_rows, shade_visibility, shade_visibility_tiled,
)
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
    from banggameengine_tpu.render.camera import Camera

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
    light = LightParams.default()

    def front(r, wm, slim):
        vis_ent = entity_frustum_mask(
            r.ent_aabb_min, r.ent_aabb_max, r.ent_has_mesh, wm, view, proj)
        tri_valid = r.tri_valid & vis_ent[r.v_entity[::3]]
        world_pos, clip = rz.transform_vertices(
            r.v_pos, r.v_entity, wm, view, proj)
        _, ov, tiled = rz.rasterize(clip, tri_valid, width, height,
                                    bin_capacity=2048, return_tiled=True,
                                    slim=slim)
        return world_pos, clip, tiled, ov

    @jax.jit
    def raster_slim(r, wm):
        _, _, tiled, ov = front(r, wm, True)
        return tiled.depth.sum(), tiled.slot.min(), ov

    @jax.jit
    def raster_full(r, wm):
        _, _, tiled, ov = front(r, wm, False)
        return tiled.depth.sum(), tiled.slot.min(), ov

    def attr_tables(r, wm, clip, world_pos):
        nm = math3d.normal_matrix(wm)
        world_nrm = rz.transform_normals(r.v_nrm, r.v_entity, nm)
        inv_w = 1.0 / jnp.where(jnp.abs(clip[:, 3]) > 1e-9, clip[:, 3], 1e-9)
        tri_row_t, _ = _pack_tri_rows(
            world_pos, world_nrm, r.v_uv, inv_w, r.tri_material,
            r.mat_base_tint, r.mat_uv_scale, r.mat_spec_color, r.mat_tex,
            r.tex_size, True)
        return tri_row_t

    def resolve(r, wm, kl, onehot_dtype, k_pad=None, prec=None,
                backend="xla"):
        """Barriered on BOTH sides of the contraction so neither the
        one-hot build, the dot, nor the relayout can be simplified into
        the sum-consumer (earlier unbarriered variants measured fiction —
        XLA collapsed dot+sum algebraically)."""
        world_pos, clip, tiled, _ = front(r, wm, True)
        tri_row_t = attr_tables(r, wm, clip, world_pos)
        sub_row_t = jnp.concatenate(
            [jnp.repeat(tri_row_t, 2, axis=1), tiled.sub_raster], axis=0)
        n_tiles = tiled.slot.shape[0]
        px = tiled.slot.shape[1] * tiled.slot.shape[2]
        ids_kl = tiled.ids[:, :kl]
        tables = sub_row_t.T[jnp.maximum(ids_kl, 0)]     # [t, kl, C]
        slot_p = tiled.slot.reshape(n_tiles, px)
        if backend == "pallas":
            from banggameengine_tpu.render.resolve_pallas import (
                resolve_tiles_pallas,
            )

            resolved_cp = resolve_tiles_pallas(
                slot_p, jnp.swapaxes(tables, 1, 2))
            resolved_cp = jax.lax.optimization_barrier(resolved_cp)
            return resolved_cp.sum((1, 2))
        if backend == "pallas_wide":
            from banggameengine_tpu.render.resolve_pallas import (
                resolve_tiles_pallas_wide,
            )

            resolved_cp = resolve_tiles_pallas_wide(
                slot_p, jnp.swapaxes(tables, 1, 2), slot_p.max(axis=1))
            resolved_cp = jax.lax.optimization_barrier(resolved_cp)
            return resolved_cp.sum((1, 2))
        k_eff = k_pad or kl
        if k_eff != kl:
            tables = jnp.pad(tables, ((0, 0), (0, k_eff - kl), (0, 0)))
        oh = (slot_p[..., None] == jnp.arange(k_eff)[None, None, :]).astype(
            onehot_dtype)
        oh = jax.lax.optimization_barrier(oh)
        resolved = jax.lax.dot_general(
            jnp.swapaxes(tables, 1, 2), oh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)
        resolved = jax.lax.optimization_barrier(resolved)
        resolved_cp = jax.lax.optimization_barrier(
            jnp.transpose(resolved, (1, 0, 2)))
        return resolved_cp.sum((1, 2))

    P = jax.lax.Precision

    @jax.jit
    def resolve_f32(r, wm):
        return resolve(r, wm, 64, jnp.float32)          # global HIGHEST

    @jax.jit
    def resolve_f32_dflt(r, wm):
        return resolve(r, wm, 64, jnp.float32,
                       prec=(P.DEFAULT, P.DEFAULT))     # bf16-rounded rows!

    @jax.jit
    def resolve_bf16(r, wm):
        return resolve(r, wm, 64, jnp.bfloat16,
                       prec=(P.HIGHEST, P.DEFAULT))

    @jax.jit
    def resolve_bf16_128(r, wm):
        return resolve(r, wm, 64, jnp.bfloat16, k_pad=128,
                       prec=(P.HIGHEST, P.DEFAULT))

    @jax.jit
    def resolve_f32_128(r, wm):
        return resolve(r, wm, 64, jnp.float32, k_pad=128)

    @jax.jit
    def resolve_pallas(r, wm):
        return resolve(r, wm, 64, jnp.float32, backend="pallas")

    @jax.jit
    def resolve_pallas_wide(r, wm):
        # the production kernel: heavy width + per-tile chunk predication
        return resolve(r, wm, 272, jnp.float32, backend="pallas_wide")

    @jax.jit
    def fb_gather(r, wm):
        world_pos, clip, tiled, _ = front(r, wm, True)
        tri_row_t = attr_tables(r, wm, clip, world_pos)
        sub_row_t = jnp.concatenate(
            [jnp.repeat(tri_row_t, 2, axis=1), tiled.sub_raster], axis=0)
        n_tiles = tiled.slot.shape[0]
        px = tiled.slot.shape[1] * tiled.slot.shape[2]
        slot_p = tiled.slot.reshape(n_tiles, px)
        sid = jnp.take_along_axis(tiled.ids, jnp.maximum(slot_p, 0), axis=1)
        rows = jnp.take(sub_row_t, jnp.maximum(sid, 0), axis=1)
        return rows.sum((1, 2))

    def shade(r, wm, mode, resolve_backend="xla"):
        from banggameengine_tpu.render.pipeline import render_frame

        return render_frame(r, wm, view, proj, cam_pos, light,
                            width=width, height=height, bin_capacity=2048,
                            shade_mode=mode, resolve_backend=resolve_backend)

    import functools

    timeit("raster_slim", raster_slim, rs, world)
    timeit("resolve_f32", resolve_f32, rs, world)
    timeit("resolve_f32_d", resolve_f32_dflt, rs, world)
    timeit("resolve_bf16", resolve_bf16, rs, world)
    timeit("resolve_bf128", resolve_bf16_128, rs, world)
    timeit("resolve_f128", resolve_f32_128, rs, world)
    timeit("resolve_plas", resolve_pallas, rs, world)
    timeit("resolve_plasW", resolve_pallas_wide, rs, world)
    timeit("fb_gather", fb_gather, rs, world)
    timeit("shade_tiled", jax.jit(functools.partial(shade, mode="tiled")),
           rs, world)
    timeit("shade_gather", jax.jit(functools.partial(shade, mode="gather")),
           rs, world)


if __name__ == "__main__":
    main()
