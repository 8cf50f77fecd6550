"""Dump the compiled-for-TPU HLO of the flat many-world step and print the
while loops the device trace attributes time to (trace_summary manyworld_flat).

Usage: python scripts/dump_flatmw_hlo.py [while.214 while.216 ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from banggameengine_tpu.parallel.manyworld import (
    make_flat_many_world_step, make_world_mesh, replicate_input,
    replicate_state, shard_batched)
from banggameengine_tpu.scene.synthetic import build_falling_boxes
from banggameengine_tpu.state import InputFrame


def main():
    state, static = build_falling_boxes(
        8, with_character=True, with_trigger=True)
    mesh = make_world_mesh()
    bstate = shard_batched(replicate_state(state, 1000), mesh)
    binp = shard_batched(replicate_input(InputFrame.zero(), 1000), mesh)
    step = make_flat_many_world_step(static, 1000, state.comp_mask,
                                     num_steps=50)
    st = step.bound_static
    txt = step.jitted.lower(bstate, binp, *st).compile().as_text()
    with open("/tmp/flatmw_hlo.txt", "w") as f:
        f.write(txt)
    print(f"module: {len(txt)} bytes -> /tmp/flatmw_hlo.txt")
    lines = txt.splitlines()
    for name in sys.argv[1:]:
        for i, ln in enumerate(lines):
            if f"%{name} " in ln or f" {name} = " in ln:
                print("=" * 70)
                print("\n".join(lines[max(0, i - 2):i + 4]))


if __name__ == "__main__":
    main()
