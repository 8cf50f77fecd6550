"""Dump the compiled-for-TPU HLO of the stress step and print the named
fusions the device trace attributes the time to (trace_summary.py stress).

Usage: python scripts/dump_stress_hlo.py fusion.711 fusion.694 ...
       (no args: dump full module to /tmp/stress_hlo.txt)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from banggameengine_tpu.physics.step import physics_step
from banggameengine_tpu.scene.synthetic import build_falling_boxes
from banggameengine_tpu.state import InputFrame


def main():
    state, static = build_falling_boxes(10000)
    inp = InputFrame.zero()

    @jax.jit
    def run(s):
        def body(carry, _):
            return physics_step(carry, inp, static, broadphase="pallas",
                                max_neighbors=8)[0], None

        out, _ = jax.lax.scan(body, s, None, length=50)
        return out

    txt = run.lower(state).compile().as_text()
    with open("/tmp/stress_hlo.txt", "w") as f:
        f.write(txt)
    print(f"module: {len(txt)} bytes -> /tmp/stress_hlo.txt")
    names = sys.argv[1:]
    lines = txt.splitlines()
    for name in names:
        # print the fusion computation the entry references
        for i, ln in enumerate(lines):
            if f"%{name} " in ln or f"{name} = " in ln:
                print("=" * 70)
                print("\n".join(lines[max(0, i - 2):i + 6]))


if __name__ == "__main__":
    main()
