"""Device-timeline trace of the interactive step+render loop.

Traces N chained step->render pairs and reports, per device track, the
per-program execution spans and the idle GAPS between them — distinguishing
"render runs slower in-loop" from "executor idles between programs" (the
~14 ms/frame the state-sync loop pays over the sum of its parts).

Usage: python scripts/trace_loop.py [outdir] [n_pairs]
"""

from __future__ import annotations

import collections
import functools
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_trace(outdir, n):
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

    state = jax.device_put(jax.tree.map(jnp.array, built.initial_state))
    # warm both programs + the sync program
    s2, _ = jstep(state, inp, st)
    img = render(rs, s2.world, view, proj, cam_pos, None)
    np.asarray(img.ravel()[:1])
    np.asarray(s2.world.ravel()[:1])
    state = s2

    with jax.profiler.trace(outdir):
        for _ in range(n):
            s2, _ev = jstep(state, inp, st)
            state = s2
            img = render(rs, s2.world, view, proj, cam_pos, None)
        np.asarray(state.world.ravel()[:1])
    print("trace done ->", outdir, flush=True)


def analyze(outdir):
    paths = sorted(glob.glob(f"{outdir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace found under", outdir)
        return
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    # name the tracks
    pid_names = {}
    tid_names = {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    by_track = collections.defaultdict(list)
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e:
            by_track[(e["pid"], e.get("tid"))].append(e)
    for key, evs in sorted(by_track.items(),
                           key=lambda kv: -sum(e["dur"] for e in kv[1])):
        pname = pid_names.get(key[0], "?")
        tname = tid_names.get(key, "?")
        total = sum(e["dur"] for e in evs) / 1e3
        if total < 5.0:
            continue
        evs.sort(key=lambda e: e["ts"])
        span = (evs[-1]["ts"] + evs[-1]["dur"] - evs[0]["ts"]) / 1e3
        print(f"\n== track pid={key[0]}({pname}) tid={key[1]}({tname}): "
              f"{len(evs)} events, busy {total:.1f} ms, span {span:.1f} ms")
        # top-level events only (not nested): keep events not contained in
        # a longer event that started earlier
        gaps = []
        top = []
        end = -1
        for e in evs:
            if e["ts"] >= end:
                top.append(e)
                end = e["ts"] + e["dur"]
            else:
                end = max(end, e["ts"] + e["dur"])
        for a, b in zip(top, top[1:]):
            g = (b["ts"] - (a["ts"] + a["dur"])) / 1e3
            if g > 0.5:
                gaps.append((g, a["name"][:48], b["name"][:48]))
        print(f"   top-level events: {len(top)}; gaps>0.5ms: {len(gaps)}")
        for g, an, bn in gaps[:25]:
            print(f"   gap {g:8.3f} ms  after [{an}] before [{bn}]")
        # largest top-level events
        for e in sorted(top, key=lambda e: -e["dur"])[:12]:
            print(f"   big {e['dur']/1e3:8.3f} ms  {e['name'][:70]}")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_loop"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    if not os.environ.get("TRACE_PARSE_ONLY"):
        run_trace(outdir, n)
    analyze(outdir)
