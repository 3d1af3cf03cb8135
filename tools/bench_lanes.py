"""A/B the batch-mode vmap lane cap (GUETZLI_TPU_GROUP_LANES).

Encodes the same noisy-bees batch (default 16 images) at each lane cap
and prints throughput per setting. Each cap runs in a fresh subprocess
so no jitted executables or batcher group state leak between settings.
Run inside a healthy TPU window after bench.py has warmed the default
(8-lane) executables; other caps pay their own compiles in the reported
warm-up, not the measurement.

Writes benchmarks/LANES_AB_n{N}.json (N = GUETZLI_TPU_LANES_AB_N,
default 16); partial results are written even if a lane cap fails or
times out. Env knobs for off-TPU smoke testing: GUETZLI_TPU_LANES_AB_CPU
(force the CPU backend), GUETZLI_TPU_LANES_AB_CROP (square-crop the
test image).
"""

import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent

CHILD = r"""
import json, os, pathlib, sys, time
import numpy as np
REPO = pathlib.Path({repo!r})
import jax
if os.environ.get("GUETZLI_TPU_LANES_AB_CPU"):
    jax.config.update("jax_platforms", "cpu")   # smoke test off-TPU
cache = REPO / (".jax_cache_cpu" if os.environ.get("GUETZLI_TPU_LANES_AB_CPU")
                else ".jax_cache")
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from PIL import Image
from guetzli_tpu.parallel.batch_mode import process_batch
rgb = np.asarray(Image.open(REPO / "tests" / "data" / "bees.png").convert("RGB"))
n = int(os.environ.get("GUETZLI_TPU_LANES_AB_N", "16"))
crop = int(os.environ.get("GUETZLI_TPU_LANES_AB_CROP", "0"))
if crop:
    rgb = np.ascontiguousarray(rgb[:crop, :crop])
rng = np.random.default_rng(0)
imgs = [np.clip(rgb.astype(np.int16) + rng.integers(-6, 7, rgb.shape), 0, 255).astype(np.uint8)
        for _ in range(n)]
t0 = time.time(); outs = process_batch(imgs, quality=95); warm = time.time() - t0
assert all(o for o in outs)
t0 = time.time(); outs = process_batch(imgs, quality=95); dt = time.time() - t0
assert all(o for o in outs)
mpix = n * rgb.shape[0] * rgb.shape[1] / 1e6
print(json.dumps({{"lanes": os.environ.get("GUETZLI_TPU_GROUP_LANES", "8"),
                   "n": n, "warm_s": round(warm, 2),
                   "batch_s": round(dt, 2),
                   "mpix_s": round(mpix / dt, 5)}}))
"""


def main():
    results = []
    for lanes in (sys.argv[1:] or ["8", "16", "32"]):
        env = dict(os.environ, GUETZLI_TPU_GROUP_LANES=lanes,
                   GUETZLI_TPU_BATCH_WORKERS="16")
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-c", CHILD.format(repo=str(REPO))],
                env=env, capture_output=True, text=True, timeout=3600)
        except subprocess.TimeoutExpired as e:
            rec = {"lanes": lanes, "error": "timeout",
                   "stderr": ((e.stderr or b"").decode("utf-8", "replace")
                              if isinstance(e.stderr, bytes)
                              else (e.stderr or ""))[-500:]}
            rec["wall_s"] = round(time.time() - t0, 1)
            print(json.dumps(rec), flush=True)
            results.append(rec)
            continue
        rec = None
        if proc.returncode == 0:
            line = (proc.stdout.strip().splitlines() or [""])[-1]
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                rec = None
        if not rec:
            rec = {"lanes": lanes, "rc": proc.returncode,
                   "error": "child failed",
                   "stderr": proc.stderr[-500:]}
        rec["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps(rec), flush=True)
        results.append(rec)
    n = os.environ.get("GUETZLI_TPU_LANES_AB_N", "16")
    out = REPO / "benchmarks" / f"LANES_AB_n{n}.json"
    out.write_text(json.dumps({"results": results}, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
