"""Capture a jax.profiler trace of one headline program and summarize ops.

Prints per-execution op durations (name, ms, count) sorted by total time —
the op-level visibility the tunnel otherwise denies (per-call
block_until_ready does not synchronize; see utils/profiling.py).

Usage:
  python scripts/trace_summary.py frame_gather [outdir]
  python scripts/trace_summary.py manyworld
  python scripts/trace_summary.py --parse /tmp/jax_trace_x   # just re-parse
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402  (dtype-preserving copy in builders)


def parse_trace(outdir, reps=1):
    paths = sorted(glob.glob(f"{outdir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace found under", outdir)
        return
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    tot, cnt = collections.Counter(), collections.Counter()
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e:
            name = e["name"]
            if name.startswith("$") or name.startswith("np."):
                continue  # host-side frames
            tot[name] += e["dur"]
            cnt[name] += 1
    grand = 0.0
    print(f"{'ms/exec':>10}  {'count':>6}  op")
    for name, d in tot.most_common(60):
        if name.startswith("jit_"):
            print(f"{d/1000/reps:10.3f}  x{cnt[name]:<5} TOTAL {name[:90]}")
            continue
        grand += d
        print(f"{d/1000/reps:10.3f}  x{cnt[name]:<5} {name[:96]}")
    print(f"{grand/1000/reps:10.3f}  sum of listed device ops")


def trace_and_summarize(build_fn, outdir, reps=3):
    import jax

    fn, args = build_fn()
    t0 = time.time()
    out = fn(*args)          # compile + warm
    jax.tree.map(lambda x: x.block_until_ready()
                 if hasattr(x, "block_until_ready") else x, out)
    print(f"compiled+warm in {time.time()-t0:.1f}s")
    with jax.profiler.trace(outdir):
        o = None
        for _ in range(reps):
            o = fn(*args)
        # one real readback to drain the queue inside the trace window
        leaf = jax.tree.leaves(o)[0]
        import numpy as np

        np.asarray(leaf)
    print("trace done ->", outdir)
    parse_trace(outdir, reps=reps)


def build_frame(shade_mode):
    import functools

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import _load_built_demo

    from banggameengine_tpu.render.camera import Camera
    from banggameengine_tpu.render.pipeline import render_frame

    built = _load_built_demo()
    cam = Camera()
    cam.position[:] = (0.0, 4.0, -10.5)
    cam.set_yaw_pitch(3.14159 / 2, -0.12)
    fn = jax.jit(functools.partial(
        render_frame, width=1920, height=1080, bin_capacity=2048,
        shade_mode=shade_mode))
    # settle the sim first (dense character mesh in view -> the heavy
    # raster pass and heavy-tile shade resolve run, as in any real frame)
    from banggameengine_tpu.engine import make_multi_step_fn
    from banggameengine_tpu.state import InputFrame

    settle = make_multi_step_fn(built.static, 480)
    settled = settle(jax.tree.map(jnp.array, built.initial_state),
                     InputFrame.zero())
    settled = settled[0] if isinstance(settled, tuple) else settled
    args = (jax.device_put(built.render),
            jax.device_put(settled.world),
            jax.device_put(jnp.asarray(cam.view_matrix())),
            jax.device_put(jnp.asarray(cam.proj_matrix(1920 / 1080))),
            jax.device_put(jnp.asarray(cam.position)))
    return fn, args


def build_manyworld():
    import jax

    from banggameengine_tpu.parallel import (
        make_sharded_many_world_step, make_world_mesh,
        replicate_input, replicate_state,
    )
    from banggameengine_tpu.parallel.manyworld import shard_batched
    from banggameengine_tpu.scene.synthetic import build_falling_boxes
    from banggameengine_tpu.state import InputFrame

    state, static = build_falling_boxes(
        8, with_character=True, with_trigger=True)
    mesh = make_world_mesh()
    bstate = shard_batched(replicate_state(state, 1000), mesh)
    binp = shard_batched(replicate_input(InputFrame.zero(), 1000), mesh)
    step = make_sharded_many_world_step(static, mesh, num_steps=50)
    # non-donating wrapper so repeated calls inside the trace reuse args
    return (lambda s, i: step(jax.tree.map(jnp.copy, s), i)), (
        bstate, binp)


def build_manyworld_flat():
    import jax

    from banggameengine_tpu.parallel.manyworld import (
        make_flat_many_world_step, make_world_mesh,
        replicate_input, replicate_state, shard_batched,
    )
    from banggameengine_tpu.scene.synthetic import build_falling_boxes
    from banggameengine_tpu.state import InputFrame

    state, static = build_falling_boxes(
        8, with_character=True, with_trigger=True)
    mesh = make_world_mesh()
    bstate = shard_batched(replicate_state(state, 1000), mesh)
    binp = shard_batched(replicate_input(InputFrame.zero(), 1000), mesh)
    step = make_flat_many_world_step(static, 1000, state.comp_mask,
                                     num_steps=50)
    return (lambda s, i: step(jax.tree.map(jnp.copy, s), i)), (
        bstate, binp)


def build_stress():
    import jax

    from banggameengine_tpu.physics.step import physics_step
    from banggameengine_tpu.scene.synthetic import build_falling_boxes
    from banggameengine_tpu.state import InputFrame

    state, static = build_falling_boxes(10000)
    inp = InputFrame.zero()

    step1 = jax.jit(lambda s: physics_step(
        s, inp, static, broadphase="pallas", max_neighbors=8)[0])
    for _ in range(200):
        state = step1(state)
    jax.block_until_ready(state)

    @jax.jit
    def run(s):
        def body(carry, _):
            return physics_step(carry, inp, static, broadphase="pallas",
                                max_neighbors=8)[0], None

        out, _ = jax.lax.scan(body, s, None, length=50)
        return out

    return (lambda s: run(jax.tree.map(jnp.copy, s))), (state,)


BUILDERS = {
    "frame_gather": lambda: build_frame("gather"),
    "frame_tiled": lambda: build_frame("tiled"),
    "manyworld": build_manyworld,
    "manyworld_flat": build_manyworld_flat,
    "stress": build_stress,
}

if __name__ == "__main__":
    if sys.argv[1] == "--parse":
        parse_trace(sys.argv[2], reps=int(sys.argv[3]) if len(sys.argv) > 3
                    else 1)
    else:
        name = sys.argv[1]
        outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/jax_trace_{name}"
        trace_and_summarize(BUILDERS[name], outdir, reps=3)
