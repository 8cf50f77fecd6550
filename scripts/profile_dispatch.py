"""Time the per-dispatch hot paths (single step, depth, full frame, fused).

These are the interactive-loop numbers (one dispatch per tick/frame), the
counterpart of scripts/profile_render.py's stage breakdown.  Everything is
device-resident; step factories pass scenes as traced args (no embedded
constants — see scripts/find_constants.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, reps=10):
    from banggameengine_tpu.utils.profiling import measure_throughput

    med = measure_throughput(fn, *args, calls=reps) * 1e3
    print(f"{name:22s} {med:8.3f} ms  ({1e3 / med:7.1f}/s)", flush=True)
    return fn(*args)


def main():
    width, height = 1920, 1080
    from banggameengine_tpu.engine import make_step_fn
    from banggameengine_tpu.physics.config import load_physics_config
    from banggameengine_tpu.render.camera import Camera
    from banggameengine_tpu.render.pipeline import make_frame_fn, make_render_fn
    from banggameengine_tpu.scene import (
        ResourceManager, build_scene, parse_scene_json,
    )
    from banggameengine_tpu.state import InputFrame

    assets = os.environ.get("BANG_ASSETS_DIR", "/root/reference/assets")
    desc = parse_scene_json(os.path.join(assets, "scenes/demo.json"))
    built = build_scene(
        desc, ResourceManager(assets_root=assets),
        load_physics_config(os.path.join(assets, "config/physics.json")),
    )
    cam = Camera()
    cam.position[:] = (0.0, 4.0, -10.5)
    cam.set_yaw_pitch(3.14159 / 2, -0.12)
    view = jax.device_put(jnp.asarray(cam.view_matrix()))
    proj = jax.device_put(jnp.asarray(cam.proj_matrix(width / height)))
    cam_pos = jax.device_put(jnp.asarray(cam.position))
    state = jax.device_put(built.initial_state)
    inp = jax.tree.map(jax.device_put, InputFrame.zero())

    sfn = make_step_fn(built.static, donate=False)
    timeit("step (1 dispatch)", sfn, state, inp)

    depth_fn = make_render_fn(built.render, width, height,
                              bin_capacity=2048, depth_only=True)
    timeit("depth 1080p", depth_fn, state.world, view, proj, cam_pos)

    frame_fn = make_render_fn(built.render, width, height, bin_capacity=2048)
    timeit("shaded 1080p", frame_fn, state.world, view, proj, cam_pos)

    from banggameengine_tpu.utils.profiling import measure_throughput_chained

    ffn = make_frame_fn(built, width, height)
    sec, _ = measure_throughput_chained(
        ffn, jax.device_put(built.initial_state), inp, view, proj, cam_pos,
        calls=10,
    )
    med = sec * 1e3
    print(f"{'fused step+frame':22s} {med:8.3f} ms  ({1e3 / med:7.1f}/s)",
          flush=True)


if __name__ == "__main__":
    main()
