#!/bin/bash
# Probe the axon tunnel in a loop; the moment a matmul succeeds, run the
# round-4 measurement backlog (scripts/measure_backlog.sh) exactly once.
cd /root/repo
while true; do
  if timeout 420 python - <<'PY'
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); (x @ x).block_until_ready()
print("TUNNEL UP", jax.devices())
PY
  then
    echo "=== tunnel up $(date) — running backlog ==="
    bash scripts/measure_backlog.sh
    echo "=== backlog done $(date) ==="
    exit 0
  fi
  echo "probe failed $(date); sleeping 120s"
  sleep 120
done
