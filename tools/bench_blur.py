#!/usr/bin/env python3
"""A/B microbenchmark: conv-form vs matmul-form blur on the TPU.

Times (a) one sigma-7.47 blur of (3, H, W) planes and (b) the full
butteraugli diffmap, each as R reps inside one jitted fori_loop (so the
link round trip is amortized), for both blur implementations. Run with
no args; prints one JSON line. Device volatility: take best-of-3.
"""

import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def timed(fn, x, reps):
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(fn(x))
        best = min(best, (time.time() - t0))
    return best / reps


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from guetzli_tpu.ops import blur as B
    from guetzli_tpu.metric.diffmap import butteraugli_diffmap

    H, W = 304, 480  # bees bucket
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, H, W)).astype(np.float32) * 40 + 100)
    rgb0 = jnp.asarray(rng.uniform(0, 255, (3, H, W)).astype(np.float32))
    rgb1 = rgb0 + jnp.asarray(
        rng.normal(size=(3, H, W)).astype(np.float32) * 2)

    SIG, BR = 7.46953768697, -0.00457628248637
    out = {"backend": jax.default_backend()}

    def loop(fn, reps):
        def run(v):
            def body(_, a):
                return fn(a) * (1.0 / (1.0 + 1e-9))
            return jax.lax.fori_loop(0, reps, body, v)
        return jax.jit(run)

    r1 = 100
    conv1 = loop(lambda a: B._blur_conv(a, SIG, BR, None), r1)
    mat1 = loop(lambda a: B._blur_matmul(a, SIG, BR, None), r1)
    np.asarray(conv1(x)), np.asarray(mat1(x))  # compile
    out["blur_conv_ms"] = round(timed(conv1, x, r1) * 1e3, 3)
    out["blur_matmul_ms"] = round(timed(mat1, x, r1) * 1e3, 3)

    r2 = 20
    d = loop(lambda a: a * (1.0 + 1e-18 * jnp.max(
        butteraugli_diffmap(rgb0, a))), r2)
    np.asarray(d(rgb1))
    key = "diffmap_%s_ms" % B._BLUR_IMPL
    out[key] = round(timed(d, rgb1, r2) * 1e3, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
