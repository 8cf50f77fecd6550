"""Find constants embedded in jitted executables (axon dispatch killer).

On the tunneled axon platform every *executed* constant buffer in an XLA
program — a captured ``jax.Array`` (any size, even a scalar) or a captured
numpy array above the inlining threshold — costs a flat ~32 ms host
round-trip per call.  The engine's rule is therefore: hot executables carry
NO embedded constants; everything device-resident is a traced argument.

This script lowers the main hot functions (engine step, render frame) and
prints every `constant(...)` in the optimized HLO larger than a threshold,
so regressions are findable.  Usage::

    python scripts/find_constants.py [step|render|all]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def report_constants(name, lowered, min_bytes=64):
    """Print sized constants from the optimized HLO of a lowered function."""
    compiled = lowered.compile()
    hlo = compiled.as_text()
    # constant instructions look like:  %constant.N = f32[1024]{0} constant({...})
    pat = re.compile(
        r"(\S+)\s*=\s*([a-z0-9]+)\[([0-9,]*)\][^=\n]*constant\([^\n]*")
    meta_pat = re.compile(
        r'op_name="([^"]*)"(?:.*?source_file="([^"]*)".*?source_line=(\d+))?')
    sizes = {"f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8, "u64": 8,
             "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
             "pred": 1, "s8": 1, "u8": 1}
    found = []
    for m in pat.finditer(hlo):
        dtype, shape = m.group(2), m.group(3)
        n = 1
        for d in shape.split(","):
            if d:
                n *= int(d)
        nbytes = n * sizes.get(dtype, 4)
        if nbytes >= min_bytes:
            mm = meta_pat.search(m.group(0))
            meta = ""
            if mm:
                meta = mm.group(1)
                if mm.group(2):
                    meta += f"  {mm.group(2)}:{mm.group(3)}"
            found.append((nbytes, m.group(1), dtype, shape, meta))
    found.sort(reverse=True)
    print(f"== {name}: {len(found)} constants >= {min_bytes}B", flush=True)
    for nbytes, cname, dtype, shape, meta in found[:40]:
        print(f"   {nbytes:>10d} B  {dtype}[{shape}]  {cname}  {meta}",
              flush=True)
    return found


def build_demo():
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


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    built = build_demo()

    if which in ("step", "all"):
        from banggameengine_tpu.engine import engine_step
        from banggameengine_tpu.state import InputFrame
        lowered = jax.jit(engine_step).lower(
            built.initial_state, InputFrame.zero(), built.static)
        report_constants("engine_step(state, inp, static)", lowered)

    if which in ("render", "all"):
        import functools

        from banggameengine_tpu.render.pipeline import render_frame
        fn = functools.partial(render_frame, width=1920, height=1080,
                               bin_capacity=2048)
        view = jnp.eye(4)
        proj = jnp.eye(4)
        cam = jnp.zeros(3)
        lowered = jax.jit(fn).lower(
            built.render, built.initial_state.world, view, proj, cam)
        report_constants("render_frame (full shaded)", lowered)


if __name__ == "__main__":
    main()
