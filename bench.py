"""Benchmark: guetzli-class encode throughput on one TPU chip.

Headline metric: MPix/s for complete q95 encodes (quant-matrix search +
per-block zeroing + up/down refinement, butteraugli target met) of a batch
of images sharing the chip — the framework's deployment configuration
(batch mode coalesces every per-iteration device call across images; see
guetzli_tpu/parallel/batch_mode.py). Baseline: the reference encoder's
published ~1 CPU-minute per MPix (BASELINE.md: 0.0167 MPix/s, single
core). Detail includes the single-image latency number.

Prints ONE JSON line.
"""

import json
import pathlib
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
BASELINE_MPIX_S = 1.0 / 60.0  # reference: ~1 CPU-minute per megapixel
BATCH = 16


def main():
    import jax
    cache = REPO / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from PIL import Image
    import guetzli_tpu
    from guetzli_tpu.config import ProcessStats
    from guetzli_tpu.parallel.batch_mode import process_batch

    rgb = np.asarray(
        Image.open(REPO / "tests" / "data" / "bees.png").convert("RGB"))
    mpix1 = rgb.shape[0] * rgb.shape[1] / 1e6

    rng = np.random.default_rng(0)
    imgs = [np.clip(rgb.astype(np.int16)
                    + rng.integers(-6, 7, rgb.shape), 0, 255).astype(
                        np.uint8)
            for _ in range(BATCH)]

    # Warmup: one batch run compiles/loads everything (batch mode reuses
    # the single-image executables; the XLA cache persists in .jax_cache).
    t0 = time.time()
    outs = process_batch(imgs, quality=95)
    warm_batch = time.time() - t0
    assert all(o is not None and len(o) > 0 for o in outs)

    # Headline: batch mode — concurrent per-image searches multiplex the
    # chip; the overlapped device calls hide the link latency. If the
    # device is badly degraded (shared-tenant variance), report the warm-
    # up run rather than risk the harness timeout.
    if warm_batch < 300:
        t0 = time.time()
        outs = process_batch(imgs, quality=95)
        dt_batch = time.time() - t0
        t0 = time.time()
        single = guetzli_tpu.process(rgb, quality=95, stats=ProcessStats())
        dt_single = time.time() - t0
    else:
        dt_batch = warm_batch
        dt_single = float("nan")
        single = outs[0]
    warm_single = 0.0

    value = BATCH * mpix1 / dt_batch
    result = {
        "metric": "encode_throughput_q95",
        "value": round(value, 5),
        "unit": "MPix/s",
        "vs_baseline": round(value / BASELINE_MPIX_S, 2),
        "detail": {
            "image": "bees.png", "mpix_per_image": round(mpix1, 4),
            "batch": BATCH, "batch_seconds": round(dt_batch, 2),
            "single_image_seconds": (round(dt_single, 2)
                                     if dt_single == dt_single else None),
            "single_image_mpix_s": (round(mpix1 / dt_single, 5)
                                    if dt_single == dt_single else None),
            "warmup_seconds": round(warm_single + warm_batch, 2),
            "output_bytes_single": len(single),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
