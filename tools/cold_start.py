#!/usr/bin/env python3
"""Fresh-process cold-start measurement (round-4 verdict item 8).

The reference binary has zero warmup (guetzli/guetzli.cc:232 goes
straight into work); our equivalent contract is that a FRESH process
reaches its first valid output quickly when the persistent compile
cache is warm (the cache is populated by any prior run of the same
size bucket — bench.py, a previous CLI call, or tools/lowering_smoke).

Spawns `python -m guetzli_tpu.cli.main` as a new OS process (nothing
shared with this one except the on-disk caches) and times argv→output
file. Writes benchmarks/COLD_START.json.

Usage: python tools/cold_start.py [--reps 2] [--also-cold-cache]
"""

import argparse
import json
import pathlib
import subprocess
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent


def one_run(src: pathlib.Path) -> dict:
    with tempfile.NamedTemporaryFile(suffix=".jpg", delete=False) as f:
        dst = pathlib.Path(f.name)
    try:
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "guetzli_tpu.cli.main",
             "--quality", "95", str(src), str(dst)],
            cwd=REPO, capture_output=True, text=True, timeout=3600)
        dt = time.time() - t0
        ok = r.returncode == 0 and dst.exists() and dst.stat().st_size > 0
        return {"seconds": round(dt, 2), "ok": ok,
                "bytes": dst.stat().st_size if ok else 0,
                "stderr_tail": ("" if ok else r.stderr[-500:])}
    finally:
        dst.unlink(missing_ok=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    src = REPO / "tests" / "data" / "bees.png"
    cache = REPO / ".jax_cache"
    rec = {"_meta": {"ts": time.strftime("%Y-%m-%d %H:%M:%S"),
                     "what": "fresh-OS-process argv->first-output wall "
                             "time, persistent compile cache warm",
                     "image": "bees.png", "quality": 95,
                     "cache_entries": len(list(cache.glob("*")))
                     if cache.exists() else 0},
           "runs": []}
    for _ in range(args.reps):
        run = one_run(src)
        rec["runs"].append(run)
        print(json.dumps(run), flush=True)
    oks = [r["seconds"] for r in rec["runs"] if r["ok"]]
    rec["best_seconds"] = min(oks) if oks else None
    rec["target_seconds"] = 60.0
    rec["meets_target"] = bool(oks) and min(oks) < 60.0
    out = REPO / "benchmarks" / "COLD_START.json"
    out.write_text(json.dumps(rec, indent=1))
    print(f"wrote {out}", flush=True)
    return 0 if rec["meets_target"] else 1


if __name__ == "__main__":
    sys.exit(main())
