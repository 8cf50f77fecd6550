"""Chain-stall isolation, part 3: WHAT property of the step program costs
~14 ms/frame when alternated with the 1080p render?

Known from part 2: render alone 23.9 ms; real loop (step+render) 40.7;
donation irrelevant (profile_loop A/B); bump->render alternation FREE.
Candidates left: producer leaf count (16-leaf state pytree), producer
compute time (~3 ms), the step executable itself (size / #inputs), or the
step's own per-dispatch chaining cost.

Variants (queued dispatches, ONE readback, 15 calls):

  step_chain — jstep chained alone (is the chained step itself ~17 ms?)
  two_tiny   — bump_a -> bump_b alternation (two distinct tiny execs)
  fat_dep    — producer outputs the full 16-leaf state pytree (trivial
               compute), chained; render consumes its world leaf
  slow_dep   — producer does ~3 ms of MXU work, single extra leaf,
               chained; render consumes its world output
  alt_nodep  — real step chained; render reads RESIDENT world
  alt_dep    — the real loop (render reads the pending step output)
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



def _maybe(only, name):
    import os
    sel = os.environ.get("CHAIN3_ONLY", "")
    return (not sel) or name in sel.split(",")

def main(only=None):
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

    def bump_leaf(a):
        if jnp.issubdtype(a.dtype, jnp.bool_):
            return jnp.logical_xor(a, jnp.zeros((), jnp.bool_))
        return a + jnp.zeros((), a.dtype)

    fat = jax.jit(lambda s: jax.tree.map(bump_leaf, s))
    bump_a = jax.jit(lambda w: w + 0.0)
    bump_b = jax.jit(lambda w: w * 1.0)

    def slow_fn(w, d):
        def body(_, d_):
            return d_ @ d_ * 1e-6 + 1e-3
        d2 = jax.lax.fori_loop(0, 10, body, d)
        return w + d2[0, 0] * 0.0, d2

    jslow = jax.jit(slow_fn)
    dummy0 = jax.device_put(jnp.zeros((2048, 2048), jnp.float32) + 1e-3)

    world0 = jax.device_put(built.initial_state.world)

    def timeloop(name, body, readback, n=15, warmup=3):
        if not _maybe(None, name):
            return
        for _ in range(warmup):
            out = body()
        np.asarray(readback(out))
        t0 = time.perf_counter()
        for _ in range(n):
            out = body()
        np.asarray(readback(out))
        dt = (time.perf_counter() - t0) / n
        print(f"{name:12s} {dt*1e3:8.3f} ms/frame", flush=True)

    fresh = lambda: jax.device_put(jax.tree.map(jnp.array, built.initial_state))

    # step_chain: the chained step alone
    box = {"s": fresh()}

    def step_chain():
        s2, _ev = jstep(box["s"], inp, st)
        box["s"] = s2
        return s2

    timeloop("step_chain", step_chain, lambda s2: s2.world)

    # two_tiny: alternate two distinct tiny executables
    wb = {"w": world0}

    def two_tiny():
        w1 = bump_a(wb["w"])
        w2 = bump_b(w1)
        wb["w"] = w2
        return w2

    timeloop("two_tiny", two_tiny, lambda w: w)

    # fat_dep: 16-leaf trivial producer + render of its world leaf
    box["s"] = fresh()

    def fat_dep():
        s2 = fat(box["s"])
        box["s"] = s2
        return render(rs, s2.world, view, proj, cam_pos, None)

    timeloop("fat_dep", fat_dep, lambda img: img)

    # slow_dep: ~3 ms MXU producer + render of its world output
    sb = {"w": world0, "d": dummy0}

    def slow_dep():
        w2, d2 = jslow(sb["w"], sb["d"])
        sb["w"], sb["d"] = w2, d2
        return render(rs, w2, view, proj, cam_pos, None)

    timeloop("slow_dep", slow_dep, lambda img: img)

    # alt_nodep: real step chained; render reads resident world
    box["s"] = fresh()

    def alt_nodep():
        s2, _ev = jstep(box["s"], inp, st)
        box["s"] = s2
        return render(rs, world0, view, proj, cam_pos, None)

    timeloop("alt_nodep", alt_nodep, lambda img: img)

    # alt_dep: the real loop
    box["s"] = fresh()

    def alt_dep():
        s2, _ev = jstep(box["s"], inp, st)
        box["s"] = s2
        return render(rs, s2.world, view, proj, cam_pos, None)

    timeloop("alt_dep", alt_dep, lambda img: img)


if __name__ == "__main__":
    main()
