#!/bin/bash
# Trimmed TPU window capture for a short session: headline bench first,
# then the analysis profiles, then whatever else fits. Same logging shape
# as run_tpu_window.sh; each step timeout-guarded.
set -u
cd "$(dirname "$0")/.."
TS=$(date +%Y%m%d_%H%M%S)
OUT=${1:-benchmarks/tpu_window_$TS}
mkdir -p "$OUT"
echo "== TPU short window capture -> $OUT =="
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

run probe 600 python tools/perf_probe.py || { echo "probe failed; aborting"; exit 1; }
# headline first: warms the bees bucket into the persistent cache too
run bench 2400 python bench.py && cp "$OUT/bench.log" "$OUT/BENCH_window.json"
run profile_iteration 1200 python tools/profile_iteration.py
run bench_fused 1800 python tools/bench_fused.py --encode
run profile_iteration_1mpix 1800 python tools/profile_iteration.py --mpix1
run bench_configs 5400 python tools/bench_configs.py
run bench_lanes 7500 python tools/bench_lanes.py 8 16

echo "== short window capture done ($(date +%H:%M:%S), failed=$FAILED) =="
python tools/summarize_window.py "$OUT" > /dev/null 2>&1 || true
ls -la "$OUT"
[ $FAILED -ne 0 ] && exit 2
exit 0
