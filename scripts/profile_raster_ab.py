"""A/B the tile-raster backend (XLA scan vs Pallas kernel) on the chip.

Measures the depth-only 1080p config (driver config #3) and the shaded
frame for both backends, queued dispatches + one small readback.

Usage: python scripts/profile_raster_ab.py [--shaded]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from banggameengine_tpu.render.camera import Camera
from banggameengine_tpu.render.pipeline import make_render_fn
from banggameengine_tpu.utils.profiling import measure_throughput
from bench import _load_built_demo

W, H = 1920, 1080


def main():
    built = _load_built_demo()
    cam = Camera()
    cam.position[:] = (0.0, 4.0, -10.5)
    cam.set_yaw_pitch(3.14159 / 2, -0.12)
    view = jax.device_put(jnp.asarray(cam.view_matrix()))
    proj = jax.device_put(jnp.asarray(cam.proj_matrix(W / H)))
    cam_pos = jax.device_put(jnp.asarray(cam.position))
    from banggameengine_tpu.engine import make_multi_step_fn
    from banggameengine_tpu.state import InputFrame

    settle = make_multi_step_fn(built.static, 480)
    settled = settle(jax.tree.map(jnp.array, built.initial_state),
                     InputFrame.zero())
    settled = settled[0] if isinstance(settled, tuple) else settled
    world = jax.device_put(settled.world)

    shaded = "--shaded" in sys.argv
    chunk = int(os.environ.get("AB_CHUNK", "0"))
    for backend in ("xla", "pallas"):
        kw = {}
        if chunk and backend == "pallas":
            import functools as _ft

            import banggameengine_tpu.render.raster as _rz
            from banggameengine_tpu.render.pipeline import render_frame
            fn0 = jax.jit(_ft.partial(
                render_frame, width=W, height=H, bin_capacity=2048,
                depth_only=not shaded, raster_backend=backend))
            _orig = _rz.rasterize
            def _patched(*a, **k):
                k["chunk"] = chunk
                return _orig(*a, **k)
            _rz.rasterize = _patched
        fn = make_render_fn(
            built.render, W, H, bin_capacity=2048,
            depth_only=not shaded, raster_backend=backend)
        sec = measure_throughput(fn, world, view, proj, cam_pos, calls=15)
        kind = "shaded" if shaded else "depth"
        tag = f"{backend}/c{chunk}" if (chunk and backend == "pallas") else backend
        print(f"{kind} {tag:10s} {sec*1e3:8.3f} ms  ({1/sec:6.1f} fps)",
              flush=True)


if __name__ == "__main__":
    main()
