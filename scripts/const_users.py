"""Dump the consumers (with source metadata) of sized constants in the
engine step's optimized HLO.  CPU-compile for fast iteration:

    JAX_PLATFORMS=cpu python scripts/const_users.py
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from scripts.find_constants import build_demo


def main():
    built = build_demo()
    from banggameengine_tpu.engine import engine_step
    from banggameengine_tpu.state import InputFrame
    hlo = jax.jit(engine_step).lower(
        built.initial_state, InputFrame.zero(), built.static).compile().as_text()
    lines = hlo.splitlines()
    consts = []
    for l in lines:
        m = re.match(r"\s*(%constant\.\d+) = ([a-z0-9]+)\[([0-9,]+)\][^=]*constant\(", l)
        if m:
            shape = m.group(3)
            n = 1
            for d in shape.split(","):
                n *= int(d)
            if n >= 16:
                consts.append((m.group(1), m.group(2), shape))
    for name, dtype, shape in consts:
        print(f"== {name} {dtype}[{shape}]")
        pat = re.compile(re.escape(name) + r"[^0-9]")
        for l in lines:
            ls = l.strip()
            if pat.search(ls) and not ls.startswith(name + " "):
                print("   USER:", ls[:300])


if __name__ == "__main__":
    main()
