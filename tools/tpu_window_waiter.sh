#!/bin/bash
# Wait for the axon TPU tunnel to return, then capture the queued
# measurement battery (tools/run_tpu_window.sh). If the window is
# degraded (health probe fails), back off and retry — a shared chip's
# health varies across hours. Logs to /tmp/tpu_watch2.log.
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
  # 2. run the battery; rc!=0 means the health probe rejected the window
  if bash tools/run_tpu_window.sh >> "$LOG" 2>&1; then
    echo "=== window capture finished at $(date) ===" >> "$LOG"
    exit 0
  fi
  echo "=== degraded window at $(date); retrying in 20 min ===" >> "$LOG"
  sleep 1200
done
