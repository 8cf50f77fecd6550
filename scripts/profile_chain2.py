"""Isolate WHICH dependency shape pays the ~14 ms loop stall at 1080p.

All variants render the demo scene at 1920x1080 (gather shade), 15 calls,
queued dispatches + one readback:

  indep        — render(world_resident) only                  [~23 ms known]
  alt_nodep    — per frame: step chained (donated) AND render(world_resident)
                 (two executables alternate; render input resident)
  alt_dep      — the real loop: render consumes the step's pending world
  tiny_dep     — render consumes a pending world produced by a one-op
                 bump program (world + 0) chained on itself

If alt_nodep ~ 26 and alt_dep ~ 40, the stall is exactly "cross-executable
consumption of a pending buffer", not executable switching.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from banggameengine_tpu.engine import engine_step
from banggameengine_tpu.physics.step import scene_census
from banggameengine_tpu.render.camera import Camera
from banggameengine_tpu.render.pipeline import render_frame
from banggameengine_tpu.state import InputFrame
from bench import _load_built_demo

W, H = 1920, 1080


def main():
    built = _load_built_demo()
    census = scene_census(built.static)
    cam = Camera()
    cam.position[:] = (0.0, 4.0, -10.5)
    cam.set_yaw_pitch(3.14159 / 2, -0.12)
    view = jax.device_put(jnp.asarray(cam.view_matrix()))
    proj = jax.device_put(jnp.asarray(cam.proj_matrix(W / H)))
    cam_pos = jax.device_put(jnp.asarray(cam.position))
    inp = jax.tree.map(jax.device_put, InputFrame.zero())
    st = jax.device_put(built.static)
    rs = jax.device_put(built.render)

    import functools

    render = jax.jit(functools.partial(
        render_frame, width=W, height=H, bin_capacity=2048))

    def step(s, i, st_):
        return engine_step(s, i, st_, **census)

    jstep = jax.jit(step, donate_argnums=(0,))
    bump = jax.jit(lambda w: w + 0.0)

    world0 = jax.device_put(built.initial_state.world)

    def timeloop(name, body, n=15, warmup=3):
        # warm (compiles), then queue n bodies and read one image back
        img = None
        for _ in range(warmup):
            img = body()
        np.asarray(img)
        t0 = time.perf_counter()
        for _ in range(n):
            img = body()
        np.asarray(img)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:12s} {dt*1e3:8.3f} ms/frame", flush=True)

    # indep
    timeloop("indep", lambda: render(rs, world0, view, proj, cam_pos, None))

    # alt_nodep: step chains on itself; render takes resident world
    sbox = {"s": jax.device_put(jax.tree.map(jnp.array, built.initial_state))}

    def alt_nodep():
        s2, _ev = jstep(sbox["s"], inp, st)
        sbox["s"] = s2
        return render(rs, world0, view, proj, cam_pos, None)

    timeloop("alt_nodep", alt_nodep)

    # alt_dep: the real loop (render consumes pending world)
    sbox["s"] = jax.device_put(jax.tree.map(jnp.array, built.initial_state))

    def alt_dep():
        s2, _ev = jstep(sbox["s"], inp, st)
        sbox["s"] = s2
        return render(rs, s2.world, view, proj, cam_pos, None)

    timeloop("alt_dep", alt_dep)

    # tiny_dep: render consumes pending output of a one-op program
    wbox = {"w": world0}

    def tiny_dep():
        w2 = bump(wbox["w"])
        wbox["w"] = w2
        return render(rs, w2, view, proj, cam_pos, None)

    timeloop("tiny_dep", tiny_dep)


if __name__ == "__main__":
    main()
