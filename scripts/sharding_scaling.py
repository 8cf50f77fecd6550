"""Sharding scaling evidence on the virtual 8-device CPU mesh (r4 verdict #8).

No real multi-chip hardware is reachable from this environment, so the
scaling proof for the sharded modes is the COMPILED-HLO collective
inventory: which collectives each sharded step lowers to, at what shapes,
and how their per-step volume scales with the problem size.  This script
sweeps:

1. **flat-sharded many-world** (the default fast path on a slice):
   worlds/device sweep — expected collective count: ZERO (worlds are
   embarrassingly parallel; each device steps its own block-diagonal
   flat world).
2. **fully-sharded WorldState** (`parallel/sharded_world.py`): entity
   count sweep — per-step all-gather volume (the velocity/position halos
   the contact phase needs) as a function of N.
3. **entity-sharded contact phase** (`parallel/spatial.py`): same sweep
   for the compute-sharded contact phase alone.

Prints a markdown table ready for BASELINE.md.

Usage:  python scripts/sharding_scaling.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter",
               "collective-permute", "all-to-all")
_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "f16": 2, "bf16": 2,
                "s8": 1, "u8": 1, "pred": 1, "s64": 8, "f64": 8}
_SHAPE_RE = re.compile(r"(f32|s32|u32|bf16|f16|s8|u8|pred|s64|f64)"
                       r"\[([\d,]*)\]")


def _collective_stats(hlo_text: str) -> dict:
    """Per-collective (count, output bytes) from compiled HLO text."""
    stats = {}
    for line in hlo_text.splitlines():
        s = line.strip()
        m = re.match(r"(?:ROOT )?%?[\w.-]+ = (.+?) (all-gather|all-reduce|"
                     r"reduce-scatter|collective-permute|all-to-all)", s)
        if not m:
            continue
        out_shapes, op = m.group(1), m.group(2)
        nbytes = 0
        for dm in _SHAPE_RE.finditer(out_shapes):
            dt, dims = dm.group(1), dm.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * _DTYPE_BYTES[dt]
        c, b = stats.get(op, (0, 0))
        stats[op] = (c + 1, b + nbytes)
    return stats


def _fmt(stats: dict) -> str:
    if not stats:
        return "none (0 collectives)"
    return "; ".join(f"{op} x{c} ({b/1e6:.2f} MB out)"
                     for op, (c, b) in sorted(stats.items()))


def sweep_flat_sharded():
    from banggameengine_tpu.parallel.manyworld import (
        make_flat_many_world_step, make_world_mesh, replicate_input,
        replicate_state, shard_batched)
    from banggameengine_tpu.scene.synthetic import build_falling_boxes
    from banggameengine_tpu.state import InputFrame

    state, static = build_falling_boxes(
        8, with_character=True, with_trigger=True)
    mesh = make_world_mesh()
    rows = []
    for w in (8, 64, 256):
        bstate = shard_batched(replicate_state(state, w), mesh)
        binp = shard_batched(replicate_input(InputFrame.zero(), w), mesh)
        step = make_flat_many_world_step(static, w, state.comp_mask,
                                         num_steps=1, mesh=mesh)
        txt = step.jitted.lower(bstate, binp, *step.bound_static) \
            .compile().as_text()
        rows.append((f"flat-sharded MW, {w} worlds / 8 dev "
                     f"({w // 8}/dev)", _collective_stats(txt)))
    return rows


def sweep_sharded_world():
    from banggameengine_tpu.parallel.sharded_world import (
        make_entity_axis_mesh, make_fully_sharded_step, shard_world)
    from banggameengine_tpu.scene.synthetic import build_falling_boxes
    from banggameengine_tpu.state import InputFrame

    rows = []
    for n in (64, 256, 1024):
        state, static = build_falling_boxes(n, seed=2, spread=4.0)
        if state.capacity % 8:
            continue
        mesh = make_entity_axis_mesh(8)
        sstate, sstatic = shard_world(state, static, mesh)
        step = make_fully_sharded_step(static, mesh)
        try:
            txt = step.jitted.lower(
                sstate, InputFrame.zero(), sstatic).compile().as_text()
        except AttributeError:
            import functools

            jfn = jax.jit(functools.partial(step))
            txt = jfn.lower(sstate, InputFrame.zero(), sstatic) \
                .compile().as_text()
        rows.append((f"fully-sharded world, {state.capacity} bodies / "
                     f"8 dev", _collective_stats(txt)))
    return rows


def sweep_spatial():
    from banggameengine_tpu.parallel.spatial import (
        AXIS, make_entity_sharded_contact_phase)
    from banggameengine_tpu.scene.synthetic import build_falling_boxes
    from banggameengine_tpu.state import (
        BODY_DYNAMIC, COMP_CHARACTER, COMP_COLLIDER)
    from jax.sharding import Mesh

    rows = []
    for n in (64, 256, 1024):
        state, static = build_falling_boxes(n, seed=1, spread=3.0)
        if state.capacity % 8:
            continue
        mesh = Mesh(np.asarray(jax.devices()), (AXIS,))
        solid = state.alive & (
            (state.comp_mask & (COMP_COLLIDER | COMP_CHARACTER)) != 0)
        is_dyn = (static.body_type == BODY_DYNAMIC) & state.alive
        phase = make_entity_sharded_contact_phase(static, mesh)
        txt = jax.jit(phase).lower(
            state.pos, state.quat, state.lin_vel, state.ang_vel,
            is_dyn, solid, jnp.float32(1 / 120)).compile().as_text()
        rows.append((f"entity-sharded contacts, {state.capacity} bodies / "
                     f"8 dev", _collective_stats(txt)))
    return rows


def main():
    print("| mode / size | collectives per compiled step |")
    print("|---|---|")
    for fn in (sweep_flat_sharded, sweep_sharded_world, sweep_spatial):
        try:
            for name, stats in fn():
                print(f"| {name} | {_fmt(stats)} |")
        except Exception as e:
            print(f"| {fn.__name__} FAILED | {type(e).__name__}: {e} |")


if __name__ == "__main__":
    main()
