#!/usr/bin/env python3
"""BASELINE.md configuration benchmarks on the real chip.

Runs the named configs from BASELINE.md's target table and writes
benchmarks/BENCH_CONFIGS.json:

  mpix1_qNN    — ~1 MPix photo at q84/90/95/100 (single image, warm)
  batch16_q95  — 16 noisy bees variants through batch mode
  mpix8_420_q95 — ~8 MPix, force_420 (pass --mpix8 to enable; the
                  first run compiles that size bucket)

Each config reports seconds (best of --reps warm runs), MPix/s, output
size, and the reference-oracle butteraugli distance of the output (the
oracle encode for size parity is optional via --oracle-encode: the
reference needs ~1 CPU-minute per MPix).

The shared chip's throughput varies across hours (see ROADMAP.md): the
JSON includes a link-latency probe and per-run times so a degraded
window is visible in the artifact.
"""

from __future__ import annotations

import argparse
import io
import json
import pathlib
import subprocess
import tempfile
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
import sys
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))  # script lives in tools/
ORACLE = REPO / "tools" / "ref_oracle" / "build" / "oracle"


def mosaic(rgb: np.ndarray, h: int, w: int) -> np.ndarray:
    """Tile + jitter the photo to (h, w) without exact periodicity."""
    rng = np.random.default_rng(42)
    th, tw = rgb.shape[:2]
    ny, nx = -(-h // th), -(-w // tw)
    rows = []
    for y in range(ny):
        row = []
        for x in range(nx):
            t = rgb.astype(np.int16)
            t = np.clip(t + rng.integers(-9, 10, t.shape), 0, 255)
            if (x + y) % 2:
                t = t[:, ::-1]
            row.append(t)
        rows.append(np.concatenate(row, axis=1))
    big = np.concatenate(rows, axis=0)[:h, :w]
    return big.astype(np.uint8)


def oracle_distance(rgb0, rgb1):
    if not ORACLE.exists():
        return None
    h, w = rgb0.shape[:2]
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        rgb0.astype(np.uint8).tofile(td / "a.rgb")
        rgb1.astype(np.uint8).tofile(td / "b.rgb")
        r = subprocess.run(
            [str(ORACLE), "ba", str(w), str(h), str(td / "a.rgb"),
             str(td / "b.rgb")], capture_output=True, text=True,
            timeout=1800)
        return float(r.stdout.split("distance=")[1])


def oracle_encode_size(rgb, quality):
    s, _ = oracle_encode(rgb, quality)
    return s


def oracle_encode(rgb, quality, force_420=False):
    """Reference-encoder run: (size_bytes, decoded_rgb) or (None, None).
    The decoded output settles infeasible-target configs (q100 on photo
    content): when OUR distance misses the target, the contract becomes
    matching the REFERENCE's achieved distance on the same image
    (tests/test_corpus.py applies the same fallback)."""
    if not ORACLE.exists():
        return None, None
    from PIL import Image
    h, w = rgb.shape[:2]
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        rgb.astype(np.uint8).tofile(td / "in.rgb")
        import os as _os
        env = dict(_os.environ)
        if force_420:
            env["ORACLE_FORCE_420"] = "1"   # apples-to-apples: the
            # reference 4:2:0 path (preprocess_downsample.cc:157-279)
        r = subprocess.run(
            [str(ORACLE), "encode_rgb", str(w), str(h),
             str(td / "in.rgb"), str(quality), str(td / "out.jpg")],
            capture_output=True, text=True, timeout=7200, env=env)
        size = int(r.stdout.split("size=")[1])
        dec = np.asarray(Image.open(td / "out.jpg").convert("RGB"))
        return size, dec


def decode(b):
    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--mpix8", action="store_true")
    ap.add_argument("--batch100", action="store_true",
                    help="batch of 100 mixed 1-4 MPix images (hours)")
    ap.add_argument("--panorama", action="store_true",
                    help="~16 MPix single image (compiles its bucket)")
    ap.add_argument("--oracle-encode", action="store_true",
                    help="also run the reference encoder for size parity"
                         " (~1 CPU-min per MPix per config)")
    ap.add_argument("--out", default=str(REPO / "benchmarks"
                                         / "BENCH_CONFIGS.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from PIL import Image
    import guetzli_tpu
    from guetzli_tpu.config import Params, ProcessStats
    from guetzli_tpu.parallel.batch_mode import process_batch
    from guetzli_tpu.search.processor import process_rgb
    from guetzli_tpu.search.quality import butteraugli_score_for_quality

    x = jnp.ones(16)
    float(jnp.sum(x))
    t0 = time.time()
    float(jnp.sum(x))
    latency_ms = round((time.time() - t0) * 1000, 1)

    bees = np.asarray(
        Image.open(REPO / "tests" / "data" / "bees.png").convert("RGB"))
    results = {"_meta": {"ts": time.time(), "link_latency_ms": latency_ms,
                         "device": str(jax.devices()[0])}}

    def run_single(name, rgb, quality, params=None):
        p = params or Params()
        f420 = bool(p.force_420)
        p.butteraugli_target = butteraugli_score_for_quality(quality)
        mpix = rgb.shape[0] * rgb.shape[1] / 1e6
        times = []
        out = None
        for r in range(max(args.reps, 1) + 1):   # +1 warm-up, dropped
            t0 = time.time()
            out = process_rgb(p, ProcessStats(), rgb)
            times.append(round(time.time() - t0, 2))
        best = min(times[1:])
        d = oracle_distance(rgb, decode(out))
        rec = {"mpix": round(mpix, 3), "seconds": best,
               "all_seconds": times, "mpix_per_s": round(mpix / best, 4),
               "bytes": len(out),
               "oracle_distance": d,
               "target": round(p.butteraugli_target, 4)}
        bound = p.butteraugli_target
        if d is not None and d > bound * 1.0005:
            # Possibly-infeasible target: the contract falls back to
            # the reference's achieved distance on the same image
            # (test_corpus.py:106-113 applies the identical rule).
            rs, ref_dec = oracle_encode(rgb, quality, force_420=f420)
            if rs:
                rec["reference_bytes"] = rs
                rec["size_ratio"] = round(len(out) / rs, 4)
                rec["ref_distance"] = oracle_distance(rgb, ref_dec)
                bound = max(bound, rec["ref_distance"])
        if d is not None:
            rec["quality_ok"] = bool(d <= bound * 1.0005)
        if args.oracle_encode and "reference_bytes" not in rec:
            rs, _ = oracle_encode(rgb, quality, force_420=f420)
            rec["reference_bytes"] = rs
            if rs:
                rec["size_ratio"] = round(len(out) / rs, 4)
        results[name] = rec
        print(name, json.dumps(rec), flush=True)

    # ~1 MPix photo, quality sweep (1200x864 sits on the bucket ladder
    # with ~11% canvas waste; BASELINE.md "1 MPix sRGB photo")
    one = mosaic(bees, 864, 1200)
    for q in (84, 90, 95, 100):
        run_single(f"mpix1_q{q}", one, q)

    # batch of 16 (deployment shape)
    rng = np.random.default_rng(0)
    imgs = [np.clip(bees.astype(np.int16)
                    + rng.integers(-6, 7, bees.shape), 0, 255
                    ).astype(np.uint8) for _ in range(16)]
    mpix_total = 16 * bees.shape[0] * bees.shape[1] / 1e6
    process_batch(imgs, quality=95)          # warm-up
    t0 = time.time()
    outs = process_batch(imgs, quality=95)
    dt = round(time.time() - t0, 2)
    assert all(o for o in outs)
    results["batch16_q95"] = {
        "mpix": round(mpix_total, 3), "seconds": dt,
        "mpix_per_s": round(mpix_total / dt, 4),
        "bytes": [len(o) for o in outs[:4]]}
    print("batch16_q95", json.dumps(results["batch16_q95"]), flush=True)

    if args.mpix8:
        big = mosaic(bees, 2160, 3840)       # 8.3 MPix
        run_single("mpix8_420_q95", big, 95, Params(force_420=True))

    if args.panorama:
        # BASELINE.md "16 MPix panorama": extreme-aspect single image.
        pano = mosaic(bees, 1888, 8704)      # 16.4 MPix
        run_single("panorama16_q95", pano, 95)

    if args.batch100:
        # BASELINE.md "batch of 100 mixed 1-4 MPix": 4 sizes x 25, all
        # on the bucket ladder, interleaved so no two same-size images
        # are adjacent (exercises per-bucket executable reuse).
        sizes = [(864, 1200), (1200, 1504), (1504, 1888), (1504, 2368)]
        rng_b = np.random.default_rng(7)
        pool = []
        for i in range(100):
            h, w = sizes[i % 4]
            img = mosaic(bees, h, w)
            img = np.clip(img.astype(np.int16)
                          + rng_b.integers(-4, 5, img.shape), 0,
                          255).astype(np.uint8)
            pool.append(img)
        mpix_total = sum(im.shape[0] * im.shape[1] for im in pool) / 1e6
        # warm the four buckets once (not timed)
        process_batch(pool[:4], quality=95)
        t0 = time.time()
        outs = process_batch(pool, quality=95)
        dt = round(time.time() - t0, 2)
        assert all(o for o in outs)
        results["batch100_q95"] = {
            "mpix": round(mpix_total, 3), "seconds": dt,
            "mpix_per_s": round(mpix_total / dt, 4),
            "n_images": len(pool),
            "bytes_head": [len(o) for o in outs[:4]]}
        print("batch100_q95", json.dumps(results["batch100_q95"]),
              flush=True)

    outp = pathlib.Path(args.out)
    outp.parent.mkdir(exist_ok=True)
    outp.write_text(json.dumps(results, indent=1))
    print("wrote", outp)


if __name__ == "__main__":
    main()
