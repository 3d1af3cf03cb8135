#!/usr/bin/env bash
# Stable full-suite runner for hosts where one long pytest process can
# die in XLA:CPU's compiler (observed 2026-08-21: intermittent SIGSEGV
# inside backend_compile_and_load ~50 min into a single-process run of
# the whole suite, on two different tests; every per-file run passes).
# One pytest process per test file contains any native crash, and a
# crashed file is retried once before counting as a failure.
set -u
cd "$(dirname "$0")/.."
fail=0
for f in tests/test_*.py; do
    for attempt in 1 2; do
        timeout 3600 python -m pytest "$f" -x -q
        rc=$?
        [ $rc -eq 0 ] && break
        if [ $attempt -eq 2 ]; then
            echo "FAILED: $f (rc=$rc)"
            fail=1
        else
            echo "retrying $f after rc=$rc"
        fi
    done
done
exit $fail
