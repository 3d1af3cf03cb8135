#!/bin/bash
# Wait for the axon TPU tunnel to return, then capture the queued
# measurement battery (tools/run_tpu_window.sh). Retries on a degraded
# window (probe rejected, rc=1, 20 min backoff) AND on a partial capture
# (tunnel dropped mid-battery, rc=2, 5 min backoff — re-runs are cheap
# against the persistent compile cache). Logs to /tmp/tpu_watch2.log.
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_watch2.log
for attempt in $(seq 1 200); do
  # 1. wait for device acquisition to succeed at all
  until timeout 240 python -c "
import jax
d = jax.devices()
assert d and d[0].platform != 'cpu', d
import jax.numpy as jnp
x = jnp.ones((256,256)); (x@x).block_until_ready()
print('TPU_UP', d, flush=True)
" >> "$LOG" 2>&1; do
    sleep 240
  done
  echo "=== TPU up at $(date) (attempt $attempt); starting capture ===" >> "$LOG"
  bash tools/run_tpu_window.sh >> "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "=== window capture finished clean at $(date) ===" >> "$LOG"
    exit 0
  elif [ $rc -eq 2 ]; then
    echo "=== partial capture (rc=2) at $(date); retrying in 5 min ===" >> "$LOG"
    sleep 300
  else
    echo "=== degraded window (rc=$rc) at $(date); retrying in 20 min ===" >> "$LOG"
    sleep 1200
  fi
done
