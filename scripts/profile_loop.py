"""A/B the interactive frame-loop configurations on the real chip.

Measures (queued dispatches, one amortized readback):
  render      — shaded frame alone (no sim)
  split       — make_frame_fn default: step + render, two dispatches
  merged      — single fused executable (step + render in one program)
  merged x2   — fused with substeps=2 (60 Hz display / 120 Hz sim shape)
  pipelined   — render previous state while stepping

Usage: python scripts/profile_loop.py [width] [height]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from banggameengine_tpu.render.camera import Camera
from banggameengine_tpu.render.pipeline import make_frame_fn, make_render_fn
from banggameengine_tpu.state import InputFrame
from banggameengine_tpu.utils.profiling import (
    measure_throughput, measure_throughput_chained,
)


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
    cam = Camera()
    cam.position[:] = (0.0, 4.0, -10.5)
    cam.set_yaw_pitch(3.14159 / 2, -0.12)
    view = jax.device_put(jnp.asarray(cam.view_matrix()))
    proj = jax.device_put(jnp.asarray(cam.proj_matrix(width / height)))
    cam_pos = jax.device_put(jnp.asarray(cam.position))
    inp = jax.tree.map(jax.device_put, InputFrame.zero())

    rfn = make_render_fn(built.render, width, height, bin_capacity=2048)
    from banggameengine_tpu.engine import make_multi_step_fn

    settle = make_multi_step_fn(built.static, 480)
    settled = settle(jax.tree.map(jnp.array, built.initial_state),
                     InputFrame.zero())
    settled = settled[0] if isinstance(settled, tuple) else settled
    world = jax.device_put(settled.world)
    sec = measure_throughput(rfn, world, view, proj, cam_pos, calls=15)
    print(f"render        {sec * 1e3:8.3f} ms  ({1 / sec:6.1f} fps)",
          flush=True)

    def loop(name, **kwargs):
        ffn = make_frame_fn(built, width, height, **kwargs)
        s0 = jax.device_put(jax.tree.map(jnp.array, built.initial_state))
        sec, _ = measure_throughput_chained(
            ffn, s0, inp, view, proj, cam_pos, calls=15, warmup=3)
        print(f"{name:13s} {sec * 1e3:8.3f} ms  ({1 / sec:6.1f} fps)",
              flush=True)
        return sec

    loop("split")
    loop("split donate", donate=True)
    loop("merged_barrier", merged_barrier=True)
    loop("merged", merged=True)
    if "--all" in sys.argv:
        loop("merged x2", merged=True, substeps=2)
        loop("pipelined", pipelined=True)


if __name__ == "__main__":
    main()
