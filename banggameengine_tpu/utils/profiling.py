"""Profiling/tracing helpers.

Replaces the reference's hand-rolled timers (frame timer ``Time.cpp:16-29``,
physics step wall-time around ``stepSimulation`` at
``PhysicsSystem.cpp:862-867``, F9 stats ``:1330-1341``) and the stubbed bgfx
profiler hooks (``Renderer.cpp:44-46``) with:

- :class:`StepTimer`: wall-time accumulator with min/max/mean and an
  F9-style report line;
- :func:`trace_annotation`: ``jax.profiler.TraceAnnotation`` context for
  device-timeline traces (viewable in TensorBoard/XProf);
- :func:`start_trace` / :func:`stop_trace`: whole-program device traces.
"""

from __future__ import annotations

import contextlib
import time


class StepTimer:
    """Accumulates wall-clock timings for a named phase."""

    def __init__(self, name: str):
        self.name = name
        self.count = 0
        self.total = 0.0
        self.last = 0.0
        self.min = float("inf")
        self.max = 0.0

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.last = dt
            self.total += dt
            self.count += 1
            self.min = min(self.min, dt)
            self.max = max(self.max, dt)

    @property
    def mean(self) -> float:
        return self.total / self.count if self.count else 0.0

    def report(self) -> str:
        if not self.count:
            return f"[{self.name}] no samples"
        return (
            f"[{self.name}] last={self.last * 1e3:.3f}ms "
            f"mean={self.mean * 1e3:.3f}ms min={self.min * 1e3:.3f}ms "
            f"max={self.max * 1e3:.3f}ms n={self.count}"
        )


def device_sync(out) -> None:
    """Hard synchronization with the device.

    On tunneled runtimes (axon) ``jax.block_until_ready`` can return before
    execution finishes; only a host readback truly syncs (one ~30 ms tunnel
    round-trip).  Reads ONE element of the first leaf.
    """
    import numpy as np

    import jax

    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def measure_throughput(fn, *args, calls: int = 20, warmup: int = 2) -> float:
    """True per-call device seconds for a NON-donating jitted fn.

    Queues ``calls`` executions back-to-back and amortizes a single
    :func:`device_sync` readback over them — per-call ``block_until_ready``
    timing is meaningless on async/tunneled runtimes, and a readback per
    call would add the full tunnel round-trip to every sample.
    """
    import time as _time

    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    device_sync(out)
    t0 = _time.perf_counter()
    for _ in range(calls):
        out = fn(*args)
    device_sync(out)
    return (_time.perf_counter() - t0) / calls


def measure_throughput_chained(fn, state, *rest, calls: int = 20,
                               warmup: int = 2):
    """Like :func:`measure_throughput` for donating step-like fns.

    ``fn(state, *rest)`` must return the next state (or a tuple whose first
    element is).  Returns (seconds_per_call, final_state).
    """
    import time as _time

    def step(s):
        out = fn(s, *rest)
        return out[0] if isinstance(out, tuple) else out

    for _ in range(max(warmup, 1)):
        state = step(state)
    device_sync(state)
    t0 = _time.perf_counter()
    for _ in range(calls):
        state = step(state)
    device_sync(state)
    return (_time.perf_counter() - t0) / calls, state


def measure_trials(fn, *args, calls: int = 5, warmup: int = 2,
                   trials: int = 5):
    """Dispersion-aware :func:`measure_throughput` (non-donating fns).

    Returns ``per_call_seconds_list`` over ``trials`` independent timed
    windows of ``calls`` queued dispatches each (one amortized readback
    per window)."""
    import time as _time

    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    device_sync(out)
    times = []
    for _ in range(max(trials, 1)):
        t0 = _time.perf_counter()
        for _ in range(calls):
            out = fn(*args)
        device_sync(out)
        times.append((_time.perf_counter() - t0) / calls)
    return times


def measure_trials_chained(fn, state, *rest, calls: int = 5,
                           warmup: int = 2, trials: int = 5):
    """Dispersion-aware :func:`measure_throughput_chained`.

    Runs ``trials`` independent timed windows back-to-back (each ``calls``
    queued dispatches + ONE amortized readback) and returns
    ``(per_call_seconds_list, final_state)``.  A single-window number
    cannot distinguish chip contention from a real regression — the
    round-4 headline showed a 2.5x spread between two single-trial runs
    of byte-identical code; report the median and min/max of these.
    """
    import time as _time

    def step(s):
        out = fn(s, *rest)
        return out[0] if isinstance(out, tuple) else out

    for _ in range(max(warmup, 1)):
        state = step(state)
    device_sync(state)
    times = []
    for _ in range(max(trials, 1)):
        t0 = _time.perf_counter()
        for _ in range(calls):
            state = step(state)
        device_sync(state)
        times.append((_time.perf_counter() - t0) / calls)
    return times, state


def trace_annotation(name: str):
    """Named region on the device trace timeline."""
    import jax.profiler

    return jax.profiler.TraceAnnotation(name)


def start_trace(log_dir: str) -> None:
    import jax.profiler

    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    import jax.profiler

    jax.profiler.stop_trace()
