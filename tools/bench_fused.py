"""A/B microbench: fused Pallas metric kernel vs the XLA pipeline.

Measures the per-iteration fused compare (the refine loop's unit of work)
at the bees bucket, then a full bees q95 encode with the kernel on/off.
Run on the real TPU:   python tools/bench_fused.py [--encode]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encode", action="store_true",
                    help="also time full bees q95 encodes (on/off)")
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    repo = pathlib.Path(__file__).resolve().parent.parent
    cache = repo / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from PIL import Image
    from guetzli_tpu.metric.comparator import (ButteraugliComparatorTPU,
                                               _compare_coeffs_fused_dyn)
    from guetzli_tpu.jpeg.encoder import encode_rgb_to_jpeg

    rgb = np.asarray(Image.open(repo / "tests" / "data" / "bees.png")
                     .convert("RGB"))
    h, w = rgb.shape[:2]
    cmp_ = ButteraugliComparatorTPU(rgb, 0.9718)
    jpg = encode_rgb_to_jpeg(rgb)
    coeff_list = [np.asarray(c.coeffs, np.int32) * 8
                  for c in jpg.components]
    padded = [cmp_.pad_comp_grid(c, 1) for c in coeff_list]
    coeffs = jnp.asarray(np.stack(padded))

    def run(fused, reps):
        ts = []
        for i in range(reps):
            t0 = time.time()
            dmap, packed = _compare_coeffs_fused_dyn(
                coeffs, cmp_._pi0, jnp.float32(0.9718),
                jnp.int32(h), jnp.int32(w), cmp_.wb, cmp_.hb,
                (1, 1, 1), 1, fused=fused)
            host = np.asarray(packed)      # one pull = real latency
            ts.append(time.time() - t0)
        return ts, float(host[0])

    for fused in (False, True):
        ts, dist = run(fused, 3)           # warm-up/compile
        ts, dist = run(fused, args.reps)
        ts = sorted(ts)
        med = ts[len(ts) // 2]
        print(f"fused={fused}: median {med*1000:.2f} ms  "
              f"best {ts[0]*1000:.2f} ms  dist={dist:.6f}")

    if args.encode:
        # The flag is read at import, so strict A/B needs subprocesses
        # (second run of each is the warm one).
        import os
        import subprocess
        for env in ("0", "1"):
            e = dict(os.environ, GUETZLI_TPU_FUSED_METRIC=env,
                     GUETZLI_TPU_TIMING="1")
            for attempt in range(2):
                t0 = time.time()
                r = subprocess.run(
                    [sys.executable, "-m", "guetzli_tpu.cli.main",
                     str(repo / "tests" / "data" / "bees.png"),
                     "/tmp/bees_ab.jpg"], env=e, capture_output=True,
                    text=True, cwd=str(repo))
                dt = time.time() - t0
                sz = pathlib.Path("/tmp/bees_ab.jpg").stat().st_size \
                    if r.returncode == 0 else -1
                print(f"encode FUSED={env} attempt{attempt}: {dt:.2f}s "
                      f"{sz}B rc={r.returncode}")
                if r.returncode:
                    print(r.stderr[-500:])


if __name__ == "__main__":
    main()
