#!/bin/bash
# Round-3 measurement backlog: run when the tunnel comes back.
# Order: cheapest/safest first; the flat many-world compile goes LAST so a
# helper crash cannot block the other numbers.
set -x
cd /root/repo
timeout 2400 python bench.py frame 2>&1 | tail -1
timeout 2400 python bench.py cull 2>&1 | tail -1
timeout 2400 python scripts/profile_raster_ab.py 2>&1 | grep -E "^depth"
timeout 2400 python bench.py manyworld 2>&1 | tail -1
BANG_MW_LAYOUT=flat timeout 2400 python bench.py manyworld 2>&1 | tail -1
