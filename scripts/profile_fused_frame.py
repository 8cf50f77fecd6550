"""A/B the fused Pallas raster+resolve frame vs the tiled default on chip.

Measures (queued dispatches): shaded 1080p frame, settled world, for
shade_mode in (tiled, fused), plus depth-only raster for reference.

Usage: python scripts/profile_fused_frame.py [width] [height]
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from banggameengine_tpu.engine import make_multi_step_fn
from banggameengine_tpu.render.camera import Camera
from banggameengine_tpu.render.pipeline import render_frame
from banggameengine_tpu.state import InputFrame
from banggameengine_tpu.utils.profiling import measure_throughput

sys.path.insert(0, "/root/repo")
from bench import _load_built_demo


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    built = _load_built_demo()
    cam = Camera()
    cam.position[:] = (0.0, 4.0, -10.5)
    cam.set_yaw_pitch(3.14159 / 2, -0.12)
    settle = make_multi_step_fn(built.static, 480)
    settled = settle(jax.tree.map(jnp.array, built.initial_state),
                     InputFrame.zero())
    settled = settled[0] if isinstance(settled, tuple) else settled
    args = (jax.device_put(built.render),
            jax.device_put(settled.world),
            jax.device_put(jnp.asarray(cam.view_matrix())),
            jax.device_put(jnp.asarray(cam.proj_matrix(w / h))),
            jax.device_put(jnp.asarray(cam.position)))

    import numpy as np
    frames = {}
    for mode in ("tiled", "fused"):
        fn = jax.jit(functools.partial(
            render_frame, width=w, height=h, bin_capacity=2048,
            shade_mode=mode))
        try:
            t = measure_throughput(fn, *args, calls=10, warmup=2)
        except Exception as e:
            print(f"{mode:8s} FAILED: {type(e).__name__}: {str(e)[:400]}")
            continue
        frames[mode] = np.asarray(fn(*args)).astype(int)
        print(f"{mode:8s} {t*1e3:8.3f} ms/frame  ({1.0/t:.1f} fps)",
              flush=True)
    if len(frames) == 2:
        d = np.abs(frames["tiled"] - frames["fused"])
        print(f"parity: max u8 delta {d.max()}, frac diff {(d>0).mean():.2e}")

    fn = jax.jit(functools.partial(
        render_frame, width=w, height=h, bin_capacity=2048,
        depth_only=True))
    t = measure_throughput(fn, *args, calls=10, warmup=2)
    print(f"{'depth':8s} {t*1e3:8.3f} ms/frame  ({1.0/t:.1f} fps)")


if __name__ == "__main__":
    main()
