#!/bin/bash
# Capture ALL queued TPU measurements in one device window, in value order.
# Each step is timeout-guarded and logged; a mid-sequence tunnel drop loses
# only the remaining steps. Usage: tools/run_tpu_window.sh [outdir]
# Exit codes: 0 = all steps ran clean; 1 = health probe failed (window
# unusable); 2 = probe ok but >=1 later step failed (partial capture —
# the waiter retries so a tunnel drop mid-battery doesn't forfeit the
# remaining steps; re-runs are cheap against the persistent cache).
set -u
cd "$(dirname "$0")/.."
TS=$(date +%Y%m%d_%H%M%S)
OUT=${1:-benchmarks/tpu_window_$TS}
mkdir -p "$OUT"
echo "== TPU window capture -> $OUT =="
FAILED=0

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "-- $name ($(date +%H:%M:%S), timeout ${tmo}s)"
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "   rc=$rc  $(tail -1 "$OUT/$name.log" | cut -c1-160)"
  [ $rc -ne 0 ] && FAILED=1
  return $rc
}

# 0. health probe first — abort early if the window is degraded-unusable
run probe 600 python tools/perf_probe.py || { echo "probe failed; aborting"; exit 1; }

# 1. per-iteration refine-chunk breakdown (decides next optimization)
run profile_iteration 1200 python tools/profile_iteration.py
run profile_iteration_1mpix 1800 python tools/profile_iteration.py --mpix1

# 1b. fused-kernel VMEM ceiling (decides the FUSED_MAX_PIXELS default)
run probe_fused_vmem 3600 python tools/probe_fused_vmem.py

# 2. fused Pallas metric kernel micro + encode benchmark
run bench_fused 1800 python tools/bench_fused.py --encode

# 3. the headline driver bench (writes one JSON line)
run bench 2400 python bench.py && cp "$OUT/bench.log" "$OUT/BENCH_window.json"

# 4. BASELINE.md configs: 1 MPix q-sweep + batch16 (+8 MPix 4:2:0)
run bench_configs 5400 python tools/bench_configs.py --mpix8

# 5. batch lane-cap A/B (picks the GUETZLI_TPU_GROUP_LANES default).
# Outer timeout > sum of the children's internal 3600s budgets so a slow
# first cap can't get the step killed before partial results are written.
run bench_lanes 7500 python tools/bench_lanes.py 8 16
GUETZLI_TPU_LANES_AB_N=32 run bench_lanes32 7500 \
  python tools/bench_lanes.py 16 32

echo "== window capture done ($(date +%H:%M:%S), failed=$FAILED) =="
python tools/summarize_window.py "$OUT" > /dev/null 2>&1 || true
ls -la "$OUT"
[ $FAILED -ne 0 ] && exit 2
exit 0
