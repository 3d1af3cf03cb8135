#!/usr/bin/env python3
"""Committed phase-time attribution of a warm encode (verdict r4 #1).

Runs one warm-up encode then N timed encodes of bees.png (and
optionally the 1 MPix mosaic) with the processor's _Phase timers
captured in-process, and writes benchmarks/PHASE_TIMING.json with the
per-phase totals of the BEST warm run — the breakdown that says where
the remaining seconds go (device chunks vs host serialize vs link).

Usage: python tools/phase_timing.py [--mpix1] [--reps 3]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--mpix1", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from PIL import Image
    import guetzli_tpu
    from guetzli_tpu.config import ProcessStats
    from guetzli_tpu.search import processor as proc

    # capture _Phase spans in-process
    spans = []

    class RecPhase:
        def __init__(self, name):
            self.name = name

        def __enter__(self):
            self.t0 = time.time()
            return self

        def __exit__(self, *a):
            spans.append((self.name, time.time() - self.t0))

    proc._Phase = RecPhase

    x = jax.numpy.ones(16)
    float(jax.numpy.sum(x))
    t0 = time.time()
    float(jax.numpy.sum(x))
    latency_ms = round((time.time() - t0) * 1000, 1)

    bees = np.asarray(
        Image.open(REPO / "tests" / "data" / "bees.png").convert("RGB"))
    images = {"bees": bees}
    if args.mpix1:
        sys.path.insert(0, str(REPO / "tools"))
        from bench_configs import mosaic
        images["mpix1"] = mosaic(bees, 864, 1200)

    report = {"_meta": {"ts": time.strftime("%Y-%m-%d %H:%M:%S"),
                        "link_latency_ms": latency_ms,
                        "reps": args.reps}}
    for name, rgb in images.items():
        mpix = rgb.shape[0] * rgb.shape[1] / 1e6
        t0 = time.time()
        out = guetzli_tpu.process(rgb, quality=95, stats=ProcessStats())
        warmup_s = time.time() - t0
        best = None
        for _ in range(args.reps):
            spans.clear()
            t0 = time.time()
            out = guetzli_tpu.process(rgb, quality=95,
                                      stats=ProcessStats())
            dt = time.time() - t0
            if best is None or dt < best[0]:
                best = (dt, list(spans))
        phases = {}
        counts = {}
        for k, v in best[1]:
            phases[k] = round(phases.get(k, 0.0) + v, 4)
            counts[k] = counts.get(k, 0) + 1
        report[name] = {
            "mpix": round(mpix, 4), "warmup_s": round(warmup_s, 2),
            "warm_seconds": round(best[0], 3),
            "mpix_per_s": round(mpix / best[0], 5),
            "bytes": len(out),
            "phase_seconds": dict(sorted(phases.items(),
                                         key=lambda kv: -kv[1])),
            "phase_counts": counts,
            "unattributed_s": round(
                best[0] - sum(v for k, v in phases.items()
                              if k != "sfm_total"), 3),
        }
        print(name, json.dumps(report[name]), flush=True)

    out_p = REPO / "benchmarks" / "PHASE_TIMING.json"
    out_p.write_text(json.dumps(report, indent=1))
    print("wrote", out_p, flush=True)


if __name__ == "__main__":
    main()
