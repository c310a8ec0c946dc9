#!/bin/bash
# Dev tool: poll for the axon TPU tunnel to come back, then run the head
# bench plus the rowsweep accumulator-budget sweep, logging to $1.
log="${1:-/tmp/bench_when_up.log}"
cd /root/repo
echo "[watcher] start $(date -u +%H:%M:%S)" >> "$log"
for i in $(seq 1 200); do
  if timeout 90 python -c "import jax; d=jax.devices(); assert d[0].platform!='cpu'" 2>/dev/null; then
    echo "[watcher] TPU up at $(date -u +%H:%M:%S)" >> "$log"
    echo "=== bench @head (budget default 3.5e6) ===" >> "$log"
    timeout 1800 python bench.py >> "$log" 2>&1
    for b in 5e6 7e6; do
      echo "=== bench budget $b ===" >> "$log"
      MDFNET_ROWSWEEP_BUDGET=$b timeout 1800 python bench.py >> "$log" 2>&1
    done
    echo "[watcher] done $(date -u +%H:%M:%S)" >> "$log"
    exit 0
  fi
  sleep 120
done
echo "[watcher] gave up $(date -u +%H:%M:%S)" >> "$log"
exit 1
