"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (default config ``manyworld``, BASELINE.json north star):
SandboxCity physics world-steps/sec/chip with 10k rigid bodies simulated as
1k vmapped worlds x 10 bodies, stepped in lockstep on the available chip(s).
``vs_baseline`` = value / 10,000 (the target floor).

Other configs (BASELINE.json "configs"):
  demo      — single demo-scene world, headless steps/sec
  stress    — single world with many falling boxes, steps/sec
  cull      — frustum cull + vertex transform + depth-only raster, frames/sec
  frame     — full shaded 1080p frame loop (sim step + render), frames/sec

Usage: python bench.py [config] [--steps N] [--worlds W] [--bodies B]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _time_dispatches(fn, args, *, warmup=2, reps=10):
    """Per-call device seconds (queued dispatches, ONE final readback).

    ``block_until_ready`` does not synchronize on tunneled runtimes; a
    readback per call would add the tunnel round-trip to every sample."""
    from banggameengine_tpu.utils.profiling import measure_throughput

    t = measure_throughput(fn, *args, calls=reps, warmup=warmup)
    return t, fn(*args)


def bench_manyworld(num_worlds=1000, bodies_per_world=8, steps_per_dispatch=50,
                    layout=None):
    import jax

    from banggameengine_tpu.parallel import (
        make_sharded_many_world_step, make_world_mesh,
        replicate_input, replicate_state,
    )
    from banggameengine_tpu.parallel.manyworld import (
        make_flat_many_world_step, shard_batched,
    )
    from banggameengine_tpu.scene.synthetic import build_falling_boxes
    from banggameengine_tpu.state import InputFrame

    # 8 dynamic boxes + character + trigger = 10 collision objects/world
    state, static = build_falling_boxes(
        bodies_per_world, with_character=True, with_trigger=True
    )
    mesh = make_world_mesh()
    bstate = shard_batched(replicate_state(state, num_worlds), mesh)
    binp = shard_batched(replicate_input(InputFrame.zero(), num_worlds), mesh)
    def measure(step, bstate_):
        from banggameengine_tpu.utils.profiling import (
            measure_throughput_chained,
        )

        t_total, _ = measure_throughput_chained(step, bstate_, binp,
                                                calls=5, warmup=2)
        return num_worlds * steps_per_dispatch / t_total

    # the flat path's 16k-entity compile has twice coincided with the
    # remote compile helper dying (tunnel unavailable for hours) — keep it
    # opt-in until proven stable on this runtime
    if layout is None:
        import os
        layout = os.environ.get("BANG_MW_LAYOUT", "vmapped")
    best = 0.0
    if layout in ("flat", "both") and len(jax.devices()) == 1:
        # block-diagonal flat world through the transposed contact
        # pipeline (parity-tested vs the vmapped path at 2e-4/25 steps);
        # falls back to the vmapped path on any compile/run failure
        try:
            flat = make_flat_many_world_step(
                static, num_worlds, state.comp_mask,
                num_steps=steps_per_dispatch,
            )
            best = measure(flat, bstate)
            bstate = shard_batched(
                replicate_state(state, num_worlds), mesh)
        except Exception as e:  # pragma: no cover - chip-side failures
            print(f"[bench] flat path failed ({type(e).__name__}), "
                  "falling back to vmapped", file=sys.stderr)
    step = make_sharded_many_world_step(
        static, mesh, num_steps=steps_per_dispatch
    )

    world_steps_per_sec = max(best, measure(step, bstate))
    n_chips = len(jax.devices())
    value = world_steps_per_sec / n_chips
    return {
        "metric": f"world-steps/sec/chip ({num_worlds} worlds x "
        f"[{bodies_per_world} boxes + character + trigger], "
        f"lockstep x{steps_per_dispatch})",
        "value": round(value, 1),
        "unit": "world-steps/sec/chip",
        "vs_baseline": round(value / 10000.0, 3),
    }


def bench_demo(steps_per_dispatch=100):
    import jax

    from banggameengine_tpu.engine import make_multi_step_fn
    from banggameengine_tpu.state import InputFrame
    from __graft_entry__ import _load_demo_scene

    from banggameengine_tpu.utils.profiling import measure_throughput_chained

    state, static = _load_demo_scene()
    run = make_multi_step_fn(static, steps_per_dispatch)
    inp = InputFrame.zero()
    t, _ = measure_throughput_chained(run, state, inp, calls=5, warmup=2)
    value = steps_per_dispatch / t
    return {
        "metric": "demo-scene headless steps/sec (single world)",
        "value": round(value, 1),
        "unit": "steps/sec",
        "vs_baseline": round(value / 120.0, 2),  # 120 Hz realtime budget
    }


def bench_stress(num_bodies=10000, steps_per_dispatch=50):
    """Driver config #2: 10k falling rigid bodies, Pallas blocked all-pairs
    broadphase + transposed component-form contact pipeline, no rendering."""
    import jax

    from banggameengine_tpu.engine import make_multi_step_fn
    from banggameengine_tpu.scene.synthetic import build_falling_boxes
    from banggameengine_tpu.state import InputFrame

    from banggameengine_tpu.utils.profiling import measure_throughput_chained

    state, static = build_falling_boxes(num_bodies)
    run = make_multi_step_fn(
        static, steps_per_dispatch, broadphase="pallas", max_neighbors=8,
    )
    inp = InputFrame.zero()
    t, _ = measure_throughput_chained(run, state, inp, calls=4, warmup=2)
    value = steps_per_dispatch / t
    return {
        "metric": f"physics stress steps/sec ({num_bodies} falling boxes)",
        "value": round(value, 1),
        "unit": "steps/sec",
        "vs_baseline": round(value / 120.0, 2),
    }


def _load_built_demo():
    try:
        import os

        from banggameengine_tpu.physics.config import load_physics_config
        from banggameengine_tpu.scene import (
            ResourceManager, build_scene, parse_scene_json,
        )

        assets = os.environ.get("BANG_ASSETS_DIR", "/root/reference/assets")
        desc = parse_scene_json(os.path.join(assets, "scenes/demo.json"))
        return build_scene(
            desc, ResourceManager(assets_root=assets),
            load_physics_config(os.path.join(assets, "config/physics.json")),
        )
    except Exception:
        raise SystemExit("render bench needs the demo assets mounted")


def _render_setup(width, height, depth_only):
    import jax
    import jax.numpy as jnp

    from banggameengine_tpu.render.camera import Camera
    from banggameengine_tpu.render.pipeline import make_render_fn

    from banggameengine_tpu.engine import make_multi_step_fn
    from banggameengine_tpu.state import InputFrame

    built = _load_built_demo()
    cam = Camera()
    cam.position[:] = (0.0, 4.0, -10.5)
    cam.set_yaw_pitch(3.14159 / 2, -0.12)
    rfn = make_render_fn(built.render, width, height,
                         bin_capacity=2048, depth_only=depth_only)
    # settle the sim first (CJ lands, the dense character mesh is in
    # view): rendering the instant-0 world skips the heavy raster pass
    # that every real interactive frame pays, flattering the number
    settle = make_multi_step_fn(built.static, 480)
    settled = settle(jax.tree.map(jnp.array, built.initial_state),
                     InputFrame.zero())
    settled = settled[0] if isinstance(settled, tuple) else settled
    args = (
        jax.device_put(settled.world),
        jax.device_put(jnp.asarray(cam.view_matrix())),
        jax.device_put(jnp.asarray(cam.proj_matrix(width / height))),
        jax.device_put(jnp.asarray(cam.position)),
    )
    return rfn, args, built.static, built.initial_state


def bench_cull(width=1920, height=1080):
    rfn, args, _, _ = _render_setup(width, height, depth_only=True)
    t, _ = _time_dispatches(rfn, args)
    value = 1.0 / t
    return {
        "metric": f"cull+depth raster frames/sec ({width}x{height})",
        "value": round(value, 1),
        "unit": "frames/sec",
        "vs_baseline": round(value / 60.0, 2),
    }


def bench_frame(width=1920, height=1080):
    """Driver config #4: the interactive tick — ONE fused donated dispatch
    (engine step + shaded 1080p frame), the loop ``play_demo`` runs."""
    import jax
    import jax.numpy as jnp

    from banggameengine_tpu.render.camera import Camera
    from banggameengine_tpu.render.pipeline import make_frame_fn
    from banggameengine_tpu.state import InputFrame

    built = _load_built_demo()
    cam = Camera()
    cam.position[:] = (0.0, 4.0, -10.5)
    cam.set_yaw_pitch(3.14159 / 2, -0.12)
    ffn = make_frame_fn(built, width, height)
    state = jax.device_put(built.initial_state)
    inp = jax.tree.map(jax.device_put, InputFrame.zero())
    view = jax.device_put(jnp.asarray(cam.view_matrix()))
    proj = jax.device_put(jnp.asarray(cam.proj_matrix(width / height)))
    cam_pos = jax.device_put(jnp.asarray(cam.position))

    from banggameengine_tpu.utils.profiling import measure_throughput_chained

    t, _ = measure_throughput_chained(
        ffn, state, inp, view, proj, cam_pos, calls=10, warmup=2)
    value = 1.0 / t
    return {
        "metric": f"full frame loop frames/sec (sim+shaded {width}x{height})",
        "value": round(value, 1),
        "unit": "frames/sec",
        "vs_baseline": round(value / 60.0, 2),
    }


CONFIGS = {
    "manyworld": bench_manyworld,
    "demo": bench_demo,
    "stress": bench_stress,
    "cull": bench_cull,
    "frame": bench_frame,
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default="manyworld", choices=CONFIGS)
    p.add_argument("--worlds", type=int, default=1000)
    p.add_argument("--bodies", type=int, default=8)
    p.add_argument("--steps", type=int, default=None)
    args = p.parse_args(argv)

    kwargs = {}
    if args.config == "manyworld":
        kwargs = {"num_worlds": args.worlds, "bodies_per_world": args.bodies}
        if args.steps:
            kwargs["steps_per_dispatch"] = args.steps
    elif args.config in ("demo", "stress") and args.steps:
        kwargs = {"steps_per_dispatch": args.steps}

    result = CONFIGS[args.config](**kwargs)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
