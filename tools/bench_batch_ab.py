#!/usr/bin/env python3
"""A/B: batch-of-16 wall time vs worker count, on the real chip.

Round-4 verdict item 2: batch16 measured 3.2x SLOWER per image than a
serial loop (79.85 s vs 16 x 1.58 s). Suspected host-side: the old
batcher's 5 ms poll loop + 0.5 s desync deadlines, plus half-padded
lane groups when workers (4) < group lanes (8). This measures the
quiescence-flush batcher at several worker counts against the serial
loop, printing one JSON line per config with the batcher's own flush
stats so the report attributes where time went.

Usage: python tools/bench_batch_ab.py [--workers 4,8,16] [--batch 16]
Writes benchmarks/BATCH_AB.json.
"""

import argparse
import json
import os
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", default="4,8,16")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--serial-n", type=int, default=3,
                    help="serial-loop sample size (per-image time is "
                         "stable; full 16 would add minutes)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from PIL import Image
    import guetzli_tpu
    from guetzli_tpu.config import ProcessStats
    from guetzli_tpu.parallel import batch_mode

    rgb = np.asarray(
        Image.open(REPO / "tests" / "data" / "bees.png").convert("RGB"))
    mpix = rgb.shape[0] * rgb.shape[1] / 1e6
    rng = np.random.default_rng(0)
    imgs = [np.clip(rgb.astype(np.int16) + rng.integers(-6, 7, rgb.shape),
                    0, 255).astype(np.uint8) for _ in range(args.batch)]

    report = {"_meta": {"ts": time.strftime("%Y-%m-%d %H:%M:%S"),
                        "image": "bees.png", "mpix_per_image": round(mpix, 4),
                        "batch": args.batch}}

    # warm-up: compile/load every executable both modes use
    t0 = time.time()
    guetzli_tpu.process(rgb, quality=95, stats=ProcessStats())
    batch_mode.process_batch(imgs[:8], quality=95)
    report["_meta"]["warmup_s"] = round(time.time() - t0, 1)

    # serial loop baseline
    times = []
    for i in range(args.serial_n):
        t0 = time.time()
        out = guetzli_tpu.process(imgs[i], quality=95, stats=ProcessStats())
        times.append(time.time() - t0)
        assert out
    ser = min(times)
    report["serial"] = {
        "per_image_s": round(ser, 3),
        "batch_equiv_s": round(ser * args.batch, 2),
        "mpix_s": round(mpix / ser, 5)}
    print(json.dumps({"config": "serial", **report["serial"]}), flush=True)

    for w in [int(x) for x in args.workers.split(",")]:
        os.environ["GUETZLI_TPU_BATCH_WORKERS"] = str(w)
        # capture the batcher stats: patch make_batcher to remember it
        made = {}
        orig_make = batch_mode.make_batcher

        def capture(timeout=0.5):
            b = orig_make(timeout)
            made["b"] = b
            return b

        batch_mode.make_batcher = capture
        try:
            t0 = time.time()
            outs = batch_mode.process_batch(imgs, quality=95)
            dt = time.time() - t0
        finally:
            batch_mode.make_batcher = orig_make
            os.environ.pop("GUETZLI_TPU_BATCH_WORKERS", None)
        assert all(o is not None and len(o) > 0 for o in outs)
        st = made["b"].stats
        row = {
            "batch_s": round(dt, 2),
            "per_image_s": round(dt / args.batch, 3),
            "mpix_s": round(args.batch * mpix / dt, 5),
            "vs_serial": round(ser * args.batch / dt, 2),
            "flushes": st["flushes"], "requests": st["requests"],
            "handler_s": round(st["handler_s"], 1),
            "quiescence_flushes": st.get("quiescence_flushes"),
            "cap_flushes": st.get("cap_flushes"),
            "deadline_flushes": st.get("deadline_flushes"),
            "group_sizes": dict(sorted(st["group_sizes"].items())),
            "by_kind": {k: {**v, "seconds": round(v["seconds"], 1)}
                        for k, v in st.get("by_kind", {}).items()},
        }
        report[f"workers{w}"] = row
        print(json.dumps({"config": f"workers{w}", **row}), flush=True)

    out = REPO / "benchmarks" / "BATCH_AB.json"
    out.write_text(json.dumps(report, indent=1))
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
