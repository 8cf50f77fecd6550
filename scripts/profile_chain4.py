"""Chain-stall isolation, part 4: reconcile profile_loop (split = 40.8 ms,
1-element state sync) with chain3 (same loop = 66-81 ms, full-image sync).

Questions:
  A. What does a full 1080p uint8 image readback cost, alone?       [img_rt]
  B. Per-call HOST enqueue time of step and render (no sync).       [enqueue]
  C. alt_dep with 1-element STATE sync vs full-image sync, n=15/45.
     If state-sync undercounts (renders still in flight), doubling n
     should NOT double total time for the state-sync variant.
"""

from __future__ import annotations

import functools
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

    render = jax.jit(functools.partial(
        render_frame, width=W, height=H, bin_capacity=2048))

    def step(s, i, st_):
        return engine_step(s, i, st_, **census)

    jstep = jax.jit(step, donate_argnums=(0,))

    fresh = lambda: jax.device_put(jax.tree.map(jnp.array, built.initial_state))
    world0 = jax.device_put(built.initial_state.world)

    # ---- warm both programs
    box = {"s": fresh()}
    s2, _ev = jstep(box["s"], inp, st)
    box["s"] = s2
    img = render(rs, s2.world, view, proj, cam_pos, None)
    np.asarray(img)

    # A. full-image readback round-trip, alone (image already computed)
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(img)
        print(f"img_rt          {1e3*(time.perf_counter()-t0):8.3f} ms",
              flush=True)
    t0 = time.perf_counter()
    np.asarray(s2.world.ravel()[:1])
    print(f"elem_rt         {1e3*(time.perf_counter()-t0):8.3f} ms",
          flush=True)

    # B. per-call host enqueue cost (time each call, sync only at end)
    for tag in ("enqueue1", "enqueue2"):
        ts, tr = [], []
        imgs = None
        for _ in range(15):
            a = time.perf_counter()
            s2, _ev = jstep(box["s"], inp, st)
            box["s"] = s2
            b = time.perf_counter()
            imgs = render(rs, s2.world, view, proj, cam_pos, None)
            c = time.perf_counter()
            ts.append(b - a)
            tr.append(c - b)
        t0 = time.perf_counter()
        np.asarray(s2.world.ravel()[:1])
        drain_state = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(imgs)
        drain_img = time.perf_counter() - t0
        print(f"{tag}: step-enq {1e3*np.mean(ts):7.3f} ms  "
              f"render-enq {1e3*np.mean(tr):7.3f} ms  "
              f"drain(state) {1e3*drain_state:8.3f} ms  "
              f"then drain(img) {1e3*drain_img:8.3f} ms", flush=True)

    # C. n-scaling with state sync vs image sync
    def run(n, sync):
        imgs = None
        t0 = time.perf_counter()
        for _ in range(n):
            s2, _ev = jstep(box["s"], inp, st)
            box["s"] = s2
            imgs = render(rs, s2.world, view, proj, cam_pos, None)
        if sync == "state":
            np.asarray(s2.world.ravel()[:1])
        else:
            np.asarray(imgs)
        dt = time.perf_counter() - t0
        print(f"loop n={n:2d} sync={sync:5s} {1e3*dt/n:8.3f} ms/frame "
              f"(total {1e3*dt:8.1f})", flush=True)

    for n, sync in ((15, "state"), (45, "state"), (15, "image"),
                    (45, "image"), (15, "state")):
        run(n, sync)


if __name__ == "__main__":
    main()
