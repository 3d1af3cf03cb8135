#!/usr/bin/env python3
"""Find the largest canvas the fused Pallas metric kernel fits on real TPU.

The kernel's VMEM footprint is ~15 live (H, W) f32 planes plus the
(H, W) output and a (2, H, W) DMA scratch (metric/fused_pallas.py); the
default eligibility cap (GUETZLI_TPU_FUSED_MAX_PIXELS=147456, the bees
bucket) was set conservatively pending this on-hardware check. Walks the
bucket ladder upward; at each canvas compiles + runs the fused kernel on
synthetic data, checks it against the unfused XLA metric path, and times
both. Stops at the first VMEM/compile failure.

Writes benchmarks/FUSED_VMEM.json with the max passing canvas so the
default cap can be raised with evidence.
"""
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


# (H, W) ladder canvases in ascending pixel count (bees bucket first as
# the known-good control).
CANVASES = [(304, 480), (480, 608), (608, 768), (768, 960),
            (960, 1200), (1200, 1504)]


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from guetzli_tpu.metric import fused_pallas as fp
    from guetzli_tpu.metric.opsin import opsin_dynamics_image
    from guetzli_tpu.metric.frequencies import separate_frequencies
    from guetzli_tpu.metric.diffmap import diffmap_psycho_image

    on_tpu = jax.default_backend() == "tpu"
    reps = 10 if on_tpu else 1
    # CPU runs go through the Pallas interpreter (very slow) — smoke-test
    # only the smallest canvas there.
    canvases = CANVASES if on_tpu else CANVASES[:1]

    rng = np.random.default_rng(7)
    results = []
    max_ok = None
    for (H, W) in canvases:
        px = H * W
        rec = {"canvas": f"{H}x{W}", "pixels": px}
        try:
            # true dims slightly inside the canvas (border renorm active)
            h, w = H - 9, W - 5
            base = rng.uniform(0.05, 0.95, (3, H, W)).astype(np.float32)
            pert = np.clip(
                base + rng.normal(0, 0.02, base.shape), 0, 1
            ).astype(np.float32)
            mask = (np.arange(H)[:, None] < h) & (np.arange(W)[None] < w)
            base *= mask
            pert *= mask
            lin0 = jnp.asarray(base)
            lin1 = jnp.asarray(pert)

            xyb0 = opsin_dynamics_image(lin0, (h, w))
            pi0 = separate_frequencies(xyb0, (h, w))

            fused = jax.jit(lambda l: fp.fused_diffmap(l, pi0, h, w))
            t0 = time.time()
            dm_f = np.asarray(fused(lin1))
            rec["compile_s"] = round(time.time() - t0, 1)
            t0 = time.time()
            for _ in range(reps):
                dm_f = np.asarray(fused(lin1))
            rec["fused_ms"] = round((time.time() - t0) / reps * 1000, 2)

            unfused = jax.jit(lambda l: diffmap_psycho_image(
                pi0, separate_frequencies(
                    opsin_dynamics_image(l, (h, w)), (h, w)), (h, w)))
            np.asarray(unfused(lin1))  # warm
            t0 = time.time()
            for _ in range(reps):
                dm_x = np.asarray(unfused(lin1))
            rec["xla_ms"] = round((time.time() - t0) / reps * 1000, 2)

            err = np.max(np.abs(dm_f[:h, :w] - dm_x[:h, :w]))
            ref = max(np.max(dm_x[:h, :w]), 1e-6)
            rec["max_abs_err"] = float(err)
            rec["rel_err"] = float(err / ref)
            rec["ok"] = bool(err / ref < 2e-4)
            if rec["ok"]:
                max_ok = px
        except Exception as e:  # VMEM OOM surfaces as compile error
            rec["ok"] = False
            rec["error"] = f"{type(e).__name__}: {e}"[:300]
            results.append(rec)
            print(json.dumps(rec))
            break
        results.append(rec)
        print(json.dumps(rec))

    out = {"backend": jax.default_backend(), "max_ok_pixels": max_ok,
           "results": results}
    (REPO / "benchmarks").mkdir(exist_ok=True)
    (REPO / "benchmarks" / "FUSED_VMEM.json").write_text(
        json.dumps(out, indent=1))
    print("max_ok_pixels:", max_ok)


if __name__ == "__main__":
    main()
