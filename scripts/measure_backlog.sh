#!/bin/bash
# Round-4 measurement backlog: run when the tunnel comes back.
# Order: cheapest/safest first; the flat many-world 16k-entity compile goes
# LAST so a compile-helper crash cannot block the other numbers.
# Every number lands in /root/repo/MEASURE_r04.log with a timestamp.
set -x
cd /root/repo
log=MEASURE_r04.log
stamp() { date "+%F %T" >> "$log"; }

# 0. chip identity + TPU smoke tier (VERDICT r3 #7: record an artifact)
stamp
timeout 1800 python -m pytest tests_tpu/ -q 2>&1 | tail -3 | tee -a "$log" \
    | tee TPU_SMOKE_r04.txt
python -c "import jax; print(jax.devices())" >> TPU_SMOKE_r04.txt 2>&1

# 1. the five driver configs + the new fused-tick config
for cfg in demo stress cull frame tick; do
  stamp
  timeout 2400 python bench.py "$cfg" 2>&1 | tail -1 | tee -a "$log"
done

# 2. shade A/B: gather vs tiled one-hot vs pallas resolve (VERDICT r3 #4)
stamp
timeout 2400 python scripts/profile_shade2.py 2>&1 | tail -6 | tee -a "$log"

# 3. raster A/B: XLA vs pallas (VERDICT r3 #4)
stamp
timeout 2400 python scripts/profile_raster_ab.py 2>&1 \
    | grep -E "^depth" | tee -a "$log"

# 4. many-world: flat (now default) vs vmapped layouts
stamp
timeout 2400 python bench.py manyworld 2>&1 | tail -1 | tee -a "$log"
stamp
BANG_MW_LAYOUT=vmapped timeout 2400 python bench.py manyworld 2>&1 \
    | tail -1 | tee -a "$log"
