"""Isolate the per-chained-dispatch stall on the tunneled runtime.

Measures the demo engine step per-dispatch under:
  chain_donate    — state feedback, donated input (the interactive shape)
  chain_nodonate  — state feedback, no donation
  indep           — same program, same INITIAL state every call (no chain)
  chain_x4        — 4 steps per dispatch (scan), donated: does the stall
                    amortize per dispatch (expected) or per step?

Usage: python scripts/profile_chain.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from banggameengine_tpu.engine import engine_step, make_multi_step_fn
from banggameengine_tpu.physics.step import scene_census
from banggameengine_tpu.state import InputFrame
from banggameengine_tpu.utils.profiling import (
    measure_throughput, measure_throughput_chained,
)
from __graft_entry__ import _load_demo_scene


def main():
    state, static = _load_demo_scene()
    census = scene_census(static)
    inp = jax.tree.map(jax.device_put, InputFrame.zero())
    st = jax.device_put(static)

    def step(s, i, st_):
        return engine_step(s, i, st_, **census)

    jd = jax.jit(step, donate_argnums=(0,))
    jn = jax.jit(step)

    s0 = jax.device_put(jax.tree.map(jnp.array, state))
    sec, _ = measure_throughput_chained(
        lambda s, i: jd(s, i, st), s0, inp, calls=30, warmup=5)
    print(f"chain_donate    {sec*1e3:8.3f} ms/dispatch", flush=True)

    s0 = jax.device_put(jax.tree.map(jnp.array, state))
    sec, _ = measure_throughput_chained(
        lambda s, i: jn(s, i, st), s0, inp, calls=30, warmup=5)
    print(f"chain_nodonate  {sec*1e3:8.3f} ms/dispatch", flush=True)

    s0 = jax.device_put(jax.tree.map(jnp.array, state))
    sec = measure_throughput(lambda s, i: jn(s, i, st), s0, inp,
                             calls=30, warmup=5)
    print(f"indep           {sec*1e3:8.3f} ms/dispatch", flush=True)

    run4 = make_multi_step_fn(static, 4)
    s0 = jax.device_put(jax.tree.map(jnp.array, state))
    sec, _ = measure_throughput_chained(run4, s0, inp, calls=30, warmup=5)
    print(f"chain_x4        {sec*1e3:8.3f} ms/dispatch "
          f"({sec*1e3/4:.3f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
