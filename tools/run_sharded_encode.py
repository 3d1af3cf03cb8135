#!/usr/bin/env python3
"""Sharded megapixel ENCODE evidence (round-4 verdict item 7).

Runs one >=2 MPix image through the FULL encode (quant search + zeroing
+ refine) twice on the virtual 8-device CPU mesh — unsharded, and with
the metric row-sharded over sp=2 — and byte-compares the outputs. The
long-context/sharding contract (SURVEY.md §5 long-context row) is that
spatial partitioning changes nothing: per-pixel op order is preserved,
the distance max is exact in f32, entropy sums are int32. Correctness
on the virtual mesh transfers to real meshes because GSPMD partitioning
is backend-agnostic; only the collectives' transport differs (ICI).

Writes benchmarks/SHARDED_ENCODE.json. CPU-only; several hours of
single-core time at 2 MPix — run in the background.

Usage: python tools/run_sharded_encode.py [--mpix 2.0] [--sp 2]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def mosaic(bees: np.ndarray, H: int, W: int) -> np.ndarray:
    """Deterministic photographic-content canvas (same construction as
    tools/photo_corpus.py's 1 MPix mosaic)."""
    rng = np.random.default_rng(7)
    out = np.empty((H, W, 3), np.uint8)
    bh, bw = bees.shape[:2]
    for y in range(0, H, bh):
        for x in range(0, W, bw):
            t = np.roll(bees, (int(rng.integers(0, bh)),
                               int(rng.integers(0, bw))), (0, 1))
            out[y:y + bh, x:x + bw] = t[:H - y, :W - x]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mpix", type=float, default=2.0)
    ap.add_argument("--sp", type=int, default=2)
    ap.add_argument("--quality", type=float, default=95.0)
    args = ap.parse_args()

    import os
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    from guetzli_tpu.cache_guard import ensure_cache_dir
    jax.config.update("jax_compilation_cache_dir",
                      str(ensure_cache_dir(REPO / ".jax_cache_cpu")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from PIL import Image
    import guetzli_tpu
    from guetzli_tpu.config import ProcessStats
    from guetzli_tpu.parallel import mesh as pmesh, runtime

    bees = np.asarray(
        Image.open(REPO / "tests" / "data" / "bees.png").convert("RGB"))
    # 3:4-ish canvas hitting the target MPix, 16-aligned dims
    H = int((args.mpix * 1e6 * 3 / 4) ** 0.5 // 16 * 16)
    W = int(args.mpix * 1e6 / H // 16 * 16)
    rgb = mosaic(bees, H, W)
    mpix = H * W / 1e6

    rec = {"_meta": {"ts": time.strftime("%Y-%m-%d %H:%M:%S"),
                     "h": H, "w": W, "mpix": round(mpix, 3),
                     "sp": args.sp, "quality": args.quality,
                     "platform": "cpu-virtual-8dev-1core"}}

    t0 = time.time()
    plain = guetzli_tpu.process(rgb, quality=args.quality,
                                stats=ProcessStats())
    rec["unsharded"] = {"seconds": round(time.time() - t0, 1),
                        "bytes": len(plain)}
    print(json.dumps(rec["unsharded"]), flush=True)

    mesh = pmesh.make_mesh(dp=1, sp=args.sp,
                           devices=jax.devices()[:args.sp])
    t0 = time.time()
    with runtime.use_mesh(mesh):
        sharded = guetzli_tpu.process(rgb, quality=args.quality,
                                      stats=ProcessStats())
    rec["sharded"] = {"seconds": round(time.time() - t0, 1),
                      "bytes": len(sharded)}
    rec["byte_identical"] = sharded == plain
    print(json.dumps({"sharded": rec["sharded"],
                      "byte_identical": rec["byte_identical"]}),
          flush=True)

    out = REPO / "benchmarks" / "SHARDED_ENCODE.json"
    out.write_text(json.dumps(rec, indent=1))
    print(f"wrote {out}", flush=True)
    return 0 if rec["byte_identical"] else 1


if __name__ == "__main__":
    sys.exit(main())
