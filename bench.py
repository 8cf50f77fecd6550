"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json north star): SandboxCity physics
world-steps/sec/chip with 10k rigid bodies simulated as 1k lockstep worlds
x 10 bodies on the available chip(s) (flat block-diagonal layout, sharded
over the world axis on multi-device meshes).  ``vs_baseline`` = value /
10,000 (the target floor).

The DEFAULT config is ``all`` (round 5): one run measures every driver
config and the output line is the manyworld headline dict plus a
``configs`` field carrying the other four, so `BENCH_rNN.json` is the
complete record.  Every value is the MEDIAN of 3-5 independent timed
windows with a ``spread`` {min,max,trials} field — single-window numbers
cannot distinguish chip contention from regressions.

Configs (BASELINE.json "configs"):
  manyworld — 1k lockstep worlds, world-steps/sec/chip (headline)
  demo      — single demo-scene world, headless steps/sec
  stress    — single world with many falling boxes, steps/sec
  cull      — frustum cull + vertex transform + depth-only raster, frames/sec
  frame     — full shaded 1080p frame loop (sim step + render), frames/sec
  tick      — fused interactive tick (4 substeps + 720p frame), ticks/sec

Resilience (round 4): the axon TPU tunnel has failed mid-round twice
(BENCH_r03.json rc=1, backend init hang >9 min).  ``bench.py`` therefore
runs as an ORCHESTRATOR by default: it probes the backend in a bounded
subprocess, retries with backoff, runs the real measurement in a child
(``BANG_BENCH_CHILD=1``) with a hard timeout, and — only if the TPU is
unreachable after retries — reruns the child on CPU with an explicit
``"device": "cpu"`` marker so the recorded number can never be mistaken
for a chip measurement.  Every output line carries capture provenance:
``device``, ``layout`` (manyworld), ``attempts``.

Usage: python bench.py [config] [--steps N] [--worlds W] [--bodies B]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

PROBE_TIMEOUT_S = int(os.environ.get("BANG_BENCH_PROBE_TIMEOUT", "480"))
CHILD_TIMEOUT_S = int(os.environ.get("BANG_BENCH_CHILD_TIMEOUT", "3000"))
RETRY_BACKOFF_S = int(os.environ.get("BANG_BENCH_BACKOFF", "45"))


def _device_kind():
    import jax

    d = jax.devices()[0]
    return getattr(d, "device_kind", d.platform)


def _median_rate(fn, args, work_per_call, calls=5, trials=3):
    """Median work/sec over ``trials`` timed windows + a spread dict."""
    import statistics

    from banggameengine_tpu.utils.profiling import measure_trials_chained

    times, _ = measure_trials_chained(fn, *args, calls=calls, warmup=2,
                                      trials=trials)
    rates = sorted(work_per_call / t for t in times)
    return statistics.median(rates), {
        "min": round(rates[0], 1), "max": round(rates[-1], 1),
        "trials": len(rates),
    }


def bench_manyworld(num_worlds=1000, bodies_per_world=8, steps_per_dispatch=50,
                    layout=None, trials=5):
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
    from banggameengine_tpu.utils.profiling import measure_trials_chained

    # 8 dynamic boxes + character + trigger = 10 collision objects/world
    state, static = build_falling_boxes(
        bodies_per_world, with_character=True, with_trigger=True
    )
    mesh = make_world_mesh()
    bstate = shard_batched(replicate_state(state, num_worlds), mesh)
    binp = shard_batched(replicate_input(InputFrame.zero(), num_worlds), mesh)

    def measure(step, bstate_):
        # dispersion-aware (round-5 verdict #2): N independent timed
        # windows; report the MEDIAN and the min/max spread — a single
        # window cannot distinguish chip contention from a regression
        # (the round-4 record had an unexplained 2.5x spread).
        import statistics

        times, _ = measure_trials_chained(step, bstate_, binp,
                                          calls=5, warmup=2, trials=trials)
        rates = sorted(num_worlds * steps_per_dispatch / t for t in times)
        return statistics.median(rates), rates

    # Default layout: flat block-diagonal (the W*B body axis on the 128
    # lanes — the vmapped [W,B,...] layout wastes ~40x of every (8,128)
    # tile).  Sharded over the world axis on multi-device meshes (each
    # device runs its local W/D worlds as one flat block; round 5).
    # Falls back to the vmapped path ONLY on the host-side build
    # rejections the builder raises (ValueError); a chip-side compile
    # failure of the DEFAULT layout PROPAGATES and fails the bench — a
    # silent 30x-slower green run is worse than a red one (round-4
    # verdict #6).
    if layout is None:
        layout = os.environ.get("BANG_MW_LAYOUT", "flat")
    n_chips = len(jax.devices())
    best, rates, used_layout = 0.0, [], "vmapped"
    if layout in ("flat", "both"):
        try:
            flat = make_flat_many_world_step(
                static, num_worlds, state.comp_mask,
                num_steps=steps_per_dispatch,
                mesh=mesh if n_chips > 1 else None,
            )
        except ValueError as e:  # host-side topology rejection only
            used_layout = f"vmapped-fallback({type(e).__name__})"
            print(f"[bench] flat layout unavailable ({e}); "
                  "falling back to vmapped", file=sys.stderr)
        else:
            best, rates = measure(flat, bstate)
            used_layout = "flat" if n_chips == 1 else "flat-sharded"
            bstate = shard_batched(
                replicate_state(state, num_worlds), mesh)
    if layout != "flat" or best == 0.0:
        step = make_sharded_many_world_step(
            static, mesh, num_steps=steps_per_dispatch
        )
        vm, vm_rates = measure(step, bstate)
        if vm > best:
            best, rates = vm, vm_rates
            if used_layout in ("flat", "flat-sharded"):
                used_layout = "vmapped(beat flat)"
    value = best / n_chips
    return {
        "metric": f"world-steps/sec/chip ({num_worlds} worlds x "
        f"[{bodies_per_world} boxes + character + trigger], "
        f"lockstep x{steps_per_dispatch})",
        "value": round(value, 1),
        "unit": "world-steps/sec/chip",
        "vs_baseline": round(value / 10000.0, 3),
        "layout": used_layout,
        "spread": {"min": round(rates[0] / n_chips, 1),
                   "max": round(rates[-1] / n_chips, 1),
                   "trials": len(rates)},
    }


def bench_demo(steps_per_dispatch=100):
    from banggameengine_tpu.engine import make_multi_step_fn
    from banggameengine_tpu.state import InputFrame
    from __graft_entry__ import _load_demo_scene

    state, static = _load_demo_scene()
    run = make_multi_step_fn(static, steps_per_dispatch)
    inp = InputFrame.zero()
    value, spread = _median_rate(run, (state, inp), steps_per_dispatch,
                                 calls=5)
    return {
        "metric": "demo-scene headless steps/sec (single world)",
        "value": round(value, 1),
        "unit": "steps/sec",
        "vs_baseline": round(value / 120.0, 2),  # 120 Hz realtime budget
        "spread": spread,
    }


def bench_stress(num_bodies=10000, steps_per_dispatch=50):
    """Driver config #2: 10k falling rigid bodies, Pallas blocked all-pairs
    broadphase + transposed component-form contact pipeline, no rendering."""
    from banggameengine_tpu.engine import make_multi_step_fn
    from banggameengine_tpu.scene.synthetic import build_falling_boxes
    from banggameengine_tpu.state import InputFrame

    state, static = build_falling_boxes(num_bodies)
    run = make_multi_step_fn(
        static, steps_per_dispatch, broadphase="pallas", max_neighbors=8,
    )
    inp = InputFrame.zero()
    value, spread = _median_rate(run, (state, inp), steps_per_dispatch,
                                 calls=4)
    return {
        "metric": f"physics stress steps/sec ({num_bodies} falling boxes)",
        "value": round(value, 1),
        "unit": "steps/sec",
        "vs_baseline": round(value / 120.0, 2),
        "spread": spread,
    }


def _load_built_demo():
    try:
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
    import statistics

    from banggameengine_tpu.utils.profiling import measure_trials

    rfn, args, _, _ = _render_setup(width, height, depth_only=True)
    times = measure_trials(rfn, *args, calls=10, warmup=2, trials=3)
    rates = sorted(1.0 / t for t in times)
    value = statistics.median(rates)
    return {
        "metric": f"cull+depth raster frames/sec ({width}x{height})",
        "value": round(value, 1),
        "unit": "frames/sec",
        "vs_baseline": round(value / 60.0, 2),
        "spread": {"min": round(rates[0], 1), "max": round(rates[-1], 1),
                   "trials": len(rates)},
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

    value, spread = _median_rate(
        ffn, (state, inp, view, proj, cam_pos), 1.0, calls=10)
    return {
        "metric": f"full frame loop frames/sec (sim+shaded {width}x{height})",
        "value": round(value, 1),
        "unit": "frames/sec",
        "vs_baseline": round(value / 60.0, 2),
        "spread": spread,
    }


def bench_tick(width=1280, height=720, substeps=4):
    """Interactive fused tick at the reference's default window: 4 fixed
    substeps (120 Hz sim inside a 30 Hz display frame,
    Application.cpp:97-101) + one shaded frame, ONE fused dispatch — the
    loop ``play_demo`` (fused default) runs.  Amortizes the ~2.7 ms
    per-dispatch tunnel overhead that bounds the split interactive path."""
    import jax
    import jax.numpy as jnp

    from banggameengine_tpu.render.camera import Camera
    from banggameengine_tpu.render.pipeline import make_frame_fn
    from banggameengine_tpu.state import InputFrame

    built = _load_built_demo()
    cam = Camera()
    cam.position[:] = (0.0, 4.0, -10.5)
    cam.set_yaw_pitch(3.14159 / 2, -0.12)
    ffn = make_frame_fn(built, width, height, substeps=substeps)
    state = jax.device_put(built.initial_state)
    inp = jax.tree.map(jax.device_put, InputFrame.zero())
    view = jax.device_put(jnp.asarray(cam.view_matrix()))
    proj = jax.device_put(jnp.asarray(cam.proj_matrix(width / height)))
    cam_pos = jax.device_put(jnp.asarray(cam.position))

    value, spread = _median_rate(
        ffn, (state, inp, view, proj, cam_pos), 1.0, calls=10)
    return {
        "metric": f"fused interactive ticks/sec ({substeps} substeps + "
        f"shaded {width}x{height} frame, one dispatch)",
        "value": round(value, 1),
        "unit": "ticks/sec",
        # 30 ticks/s x 4 substeps = the reference's 120 Hz sim bar
        "vs_baseline": round(value / 30.0, 2),
        "spread": spread,
    }


def bench_all():
    """Every driver config in ONE run (round-5 verdict #7): the output
    line is the manyworld HEADLINE dict (same contract as before) plus a
    ``configs`` field carrying the other four driver configs' values, so
    the record of record (`BENCH_rNN.json`) captures all five driver-side.
    A headline failure fails the run (rc!=0); a sub-config failure is
    recorded as an ``error`` string without masking the headline.

    Time budget: the orchestrator kills the child at CHILD_TIMEOUT_S —
    and the axon tunnel has wedged MID-RUN three times across five
    rounds.  Rather than risk the whole record on the last config's
    compile, sub-configs are skipped (recorded as ``skipped(budget)``)
    once the elapsed run time crosses ``BANG_BENCH_ALL_BUDGET`` seconds:
    a partial record with the headline beats a timed-out rc!=0."""
    budget_s = int(os.environ.get("BANG_BENCH_ALL_BUDGET",
                                  str(int(CHILD_TIMEOUT_S * 0.7))))
    t0 = time.monotonic()
    headline = bench_manyworld()
    configs = {}
    for name, fn in (("demo", bench_demo), ("stress", bench_stress),
                     ("cull", bench_cull), ("frame", bench_frame),
                     ("tick", bench_tick)):
        if time.monotonic() - t0 > budget_s:
            configs[name] = {"error": "skipped(budget)"}
            print(f"[bench] config {name} skipped: {budget_s}s budget "
                  "spent", file=sys.stderr)
            continue
        try:
            configs[name] = fn()
        except Exception as e:  # recorded, not masked
            configs[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"[bench] config {name} failed: {e}", file=sys.stderr)
    headline["configs"] = configs
    return headline


CONFIGS = {
    "manyworld": bench_manyworld,
    "demo": bench_demo,
    "stress": bench_stress,
    "cull": bench_cull,
    "frame": bench_frame,
    "tick": bench_tick,
    "all": bench_all,
}


def _force_cpu_if_requested():
    # The environment ships an 'axon' TPU-tunnel plugin that wins platform
    # selection even with JAX_PLATFORMS=cpu in the env; the config API call
    # (before any backend init) is the only thing that actually forces CPU.
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")


def _child_main(args):
    """Run the actual measurement in-process and print the JSON line."""
    _force_cpu_if_requested()
    kwargs = {}
    if args.config == "manyworld":
        kwargs = {"num_worlds": args.worlds, "bodies_per_world": args.bodies}
        if args.steps:
            kwargs["steps_per_dispatch"] = args.steps
    elif args.config in ("demo", "stress") and args.steps:
        kwargs = {"steps_per_dispatch": args.steps}

    result = CONFIGS[args.config](**kwargs)
    result["device"] = _device_kind()
    print(json.dumps(result))


# ---------------------------------------------------------------------------
# Orchestrator: bounded probe + retry + hard child timeout + CPU fallback
# ---------------------------------------------------------------------------

_PROBE_SRC = (
    "import os, jax;"
    "os.environ.get('JAX_PLATFORMS') == 'cpu' "
    "and jax.config.update('jax_platforms', 'cpu');"
    "import jax.numpy as jnp;"
    "x = jnp.ones((256, 256));"
    "import numpy as np;"
    "np.asarray((x @ x).ravel()[:1]);"
    "print('PROBE_OK', jax.devices()[0].platform)"
)


def _run_probe(env):
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC], env=env,
            capture_output=True, text=True, timeout=PROBE_TIMEOUT_S,
        )
        return r.returncode == 0 and "PROBE_OK" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _run_child(argv, env):
    """Run the measurement child; returns the parsed JSON dict or None."""
    cmd = [sys.executable, os.path.abspath(__file__)] + argv
    try:
        r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=CHILD_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        print("[bench] child timed out", file=sys.stderr)
        return None
    sys.stderr.write(r.stderr[-2000:])
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            obj = json.loads(line)
            if isinstance(obj, dict) and "metric" in obj:
                return obj
        except json.JSONDecodeError:
            continue
    print(f"[bench] child rc={r.returncode}, no JSON line", file=sys.stderr)
    return None


def _orchestrate(argv):
    base_env = dict(os.environ)
    base_env["BANG_BENCH_CHILD"] = "1"
    attempts = []

    # up to 2 TPU attempts, each gated by a bounded backend probe
    for attempt in range(2):
        if attempt:
            time.sleep(RETRY_BACKOFF_S)
        if not _run_probe(base_env):
            attempts.append("tpu-probe-failed")
            print(f"[bench] backend probe failed (attempt {attempt + 1})",
                  file=sys.stderr)
            continue
        result = _run_child(argv, base_env)
        if result is not None:
            result["attempts"] = attempts + [f"tpu-ok(try{attempt + 1})"]
            print(json.dumps(result))
            return 0
        attempts.append("tpu-child-failed")

    # CPU fallback: honest rc=0 with an unmissable device marker.  A CPU
    # number is NOT comparable to the chip targets — vs_baseline will be
    # far below 1 — but it proves the code path works and records that the
    # tunnel, not the engine, was down.
    print("[bench] TPU unreachable after retries; falling back to CPU "
          "(device field will say so)", file=sys.stderr)
    cpu_env = dict(base_env)
    cpu_env["JAX_PLATFORMS"] = "cpu"
    cpu_env["BANG_BENCH_CPU_FALLBACK"] = "1"
    # shrink the workload so the CPU run finishes in minutes
    cpu_argv = list(argv)
    if not argv or argv[0] in ("manyworld", "all"):
        cpu_argv = ["manyworld", "--worlds", "64", "--steps", "10"]
    result = _run_child(cpu_argv, cpu_env)
    if result is None:
        print(json.dumps({
            "metric": "bench failed (TPU tunnel down, CPU fallback failed)",
            "value": 0.0, "unit": "none", "vs_baseline": 0.0,
            "device": "none", "attempts": attempts + ["cpu-failed"],
        }))
        return 1
    result["attempts"] = attempts + ["cpu-fallback"]
    result["device"] = "cpu (TPU TUNNEL DOWN — not a chip number)"
    print(json.dumps(result))
    return 0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default="all", choices=CONFIGS)
    p.add_argument("--worlds", type=int, default=1000)
    p.add_argument("--bodies", type=int, default=8)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--no-orchestrate", action="store_true",
                   help="run the measurement in-process (no probe/retry)")
    args = p.parse_args(argv)

    if os.environ.get("BANG_BENCH_CHILD") == "1" or args.no_orchestrate:
        _child_main(args)
        return 0

    raw = list(sys.argv[1:] if argv is None else argv)
    if "--no-orchestrate" in raw:
        raw.remove("--no-orchestrate")
    return _orchestrate(raw)


if __name__ == "__main__":
    sys.exit(main())
