"""Benchmark: full q95 encode throughput on the reference's own test image.

Prints one JSON line: MPix/s for a complete guetzli-class encode
(quant-matrix search + zeroing + refinement, distance target met), compared
against the reference's published ~1 CPU-minute per MPix (BASELINE.md:
0.017 MPix/s). Runs on whatever backend the environment provides (the
driver supplies one real TPU chip).
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
BASELINE_MPIX_S = 1.0 / 60.0  # reference: ~1 CPU-minute per megapixel


def main():
    import jax
    cache = REPO / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from PIL import Image
    import guetzli_tpu
    from guetzli_tpu.config import ProcessStats

    rgb = np.asarray(
        Image.open(REPO / "tests" / "data" / "bees.png").convert("RGB"))
    mpix = rgb.shape[0] * rgb.shape[1] / 1e6

    # Warmup: compile everything (cached on disk for later runs).
    t0 = time.time()
    out = guetzli_tpu.process(rgb, quality=95, stats=ProcessStats())
    warm = time.time() - t0

    t0 = time.time()
    out = guetzli_tpu.process(rgb, quality=95, stats=ProcessStats())
    dt = time.time() - t0

    value = mpix / dt
    result = {
        "metric": "encode_throughput_q95",
        "value": round(value, 5),
        "unit": "MPix/s",
        "vs_baseline": round(value / BASELINE_MPIX_S, 2),
        "detail": {
            "image": "bees.png", "mpix": round(mpix, 4),
            "seconds": round(dt, 2), "warmup_seconds": round(warm, 2),
            "output_bytes": len(out),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
