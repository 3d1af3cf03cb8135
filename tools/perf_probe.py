#!/usr/bin/env python3
"""Standard TPU performance probe.

Appends one JSON line to tools/perf_log.jsonl: link latency, warm
single-image encode, and (if the device looks healthy) batch throughput.
Run repeatedly — the shared chip's performance varies wildly across hours
(see ROADMAP.md), so only healthy-window samples are comparable.
"""

import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
import sys
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))  # script lives in tools/


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from PIL import Image
    import guetzli_tpu
    from guetzli_tpu.config import ProcessStats
    from guetzli_tpu.parallel.batch_mode import process_batch

    rec = {"ts": time.time()}
    x = jnp.ones(16)
    float(jnp.sum(x))
    t0 = time.time()
    float(jnp.sum(x))
    rec["latency_ms"] = round((time.time() - t0) * 1000, 1)

    rgb = np.asarray(
        Image.open(REPO / "tests" / "data" / "bees.png").convert("RGB"))
    mpix = rgb.shape[0] * rgb.shape[1] / 1e6
    t0 = time.time()
    out = guetzli_tpu.process(rgb, quality=95, stats=ProcessStats())
    rec["single_s"] = round(time.time() - t0, 1)
    rec["single_bytes"] = len(out)
    rec["healthy"] = rec["single_s"] < 25

    if rec["healthy"]:
        rng = np.random.default_rng(0)
        imgs = [np.clip(rgb.astype(np.int16)
                        + rng.integers(-6, 7, rgb.shape), 0, 255)
                .astype(np.uint8) for _ in range(8)]
        t0 = time.time()
        outs = process_batch(imgs, quality=95)
        dt = time.time() - t0
        rec["batch8_s"] = round(dt, 1)
        rec["batch8_mpix_s"] = round(8 * mpix / dt, 4)
        rec["batch8_x_baseline"] = round(8 * mpix / dt * 60, 2)
        rec["batch8_fails"] = sum(1 for o in outs if not o)

    line = json.dumps(rec)
    print(line)
    with open(REPO / "tools" / "perf_log.jsonl", "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
