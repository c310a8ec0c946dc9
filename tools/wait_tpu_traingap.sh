#!/bin/bash
# Dev tool: poll for the axon TPU tunnel, then run the back-to-back
# same-session train-gap pair (baseline b4, then b4p Pallas train U-Nets),
# logging to $1. Measurement discipline: accept/reject only on this pair.
log="${1:-/tmp/traingap_when_up.log}"
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
echo "[watcher] start $(date -u +%H:%M:%S)" >> "$log"
for i in $(seq 1 120); do
  if timeout 90 python -c "import jax; d=jax.devices(); assert d[0].platform!='cpu'" 2>/dev/null; then
    echo "[watcher] TPU up at $(date -u +%H:%M:%S)" >> "$log"
    echo "=== b4 (baseline) ===" >> "$log"
    timeout 1200 python tools/exp_train_gap.py b4 >> "$log" 2>&1
    echo "EXIT=$?" >> "$log"
    echo "=== b4p (pallas train U-Nets) ===" >> "$log"
    timeout 1200 python tools/exp_train_gap.py b4p >> "$log" 2>&1
    echo "EXIT=$?" >> "$log"
    echo "[watcher] done $(date -u +%H:%M:%S)" >> "$log"
    exit 0
  fi
  sleep 60
done
echo "[watcher] gave up $(date -u +%H:%M:%S)" >> "$log"
