"""TPU lowering smoke: compile every Pallas call signature an encode emits.

Round 3 shipped a metric kernel whose B>1 lowering crashed on Mosaic's
block-mapping check — the CPU test suite (Pallas interpreter) and the
B=1-only hardware probe were both blind to it, and the regression was
first caught by the driver's bench. This tool enumerates the call
signatures the encoder actually issues per canvas bucket and runs
`jax.jit(...).lower().compile()` for each on the REAL backend — no
execution, so a full sweep is minutes of (cached) XLA compile time, and
every Mosaic block-mapping / VMEM-fit defect surfaces.

Signatures covered per bucket (H, W):
  - fused_diffmap_batch (mega or staged per the bucket's dispatch) at
    B = 1 (refine probes / single compares) and B = quant-search nslots
    (the speculative search batch — round 3's blind spot)
  - _requant_compare_images: the batch-mode quant-search form (vmapped
    over group lanes, inner candidate scan), at the bucket's fixed lane
    count
  - zeroing greedy kernel at the default chunk size
  - refine_chunk (single) and refine_chunk_batch (group lanes) compile
    via their own jit entries under --full (minutes more)

Usage:  python tools/lowering_smoke.py [--buckets bees,mpix1] [--full]
Exit 0 = all signatures compile; 1 = at least one failure (JSON lines on
stdout name each).

Run this before any snapshot/commit that touches a Pallas kernel or the
shapes feeding one (wired into .claude/skills/verify).
"""

import argparse
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# Named buckets: (canvas_h, canvas_w, true_h, true_w)
BUCKETS = {
    "bees": (304, 480, 258, 444),      # tests/data/bees.png
    "mpix1": (960, 1200, 864, 1200),   # ~1 MPix bench photo
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", default="bees,mpix1")
    ap.add_argument("--full", action="store_true",
                    help="also compile the refine-chunk programs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from guetzli_tpu.metric import comparator as cmp_mod
    from guetzli_tpu.metric import fused_pallas as fp

    failures = []

    def check(name, fn):
        t0 = time.time()
        try:
            fn()
            print(json.dumps({"sig": name, "ok": True,
                              "seconds": round(time.time() - t0, 1)}),
                  flush=True)
        except Exception as e:          # noqa: BLE001
            failures.append(name)
            print(json.dumps({
                "sig": name, "ok": False,
                "seconds": round(time.time() - t0, 1),
                "error": f"{type(e).__name__}: "
                         + " ".join(str(e).split())[:600]}), flush=True)

    for bname in args.buckets.split(","):
        H, W, h, w = BUCKETS[bname]
        path = fp._bucket_path(H, W)
        # nslots from TRUE dims (what the search emits) and from the
        # padded bucket (what the probe covers) — both compile-checked.
        nslots = fp.quant_search_nslots(h, w)
        all_b = sorted({1} | set(
            fp._probe_batch_shapes(fp.bucket_key(H, W), h, w)))

        def diffmap_at(B):
            lin = jnp.zeros((B, 3, H, W), jnp.float32)
            pi0 = jnp.zeros((B, 10, H, W), jnp.float32)
            hs = jnp.full((B,), h, jnp.int32)
            ws = jnp.full((B,), w, jnp.int32)
            jax.jit(fp.fused_diffmap_batch).lower(
                lin, pi0, hs, ws).compile()

        for B in all_b:
            check(f"{bname}/{path}_diffmap_B{B}", lambda B=B: diffmap_at(B))

        # batch-mode quant search: vmapped over group lanes
        from guetzli_tpu.parallel.batch_mode import _lanes_for_canvas
        lanes = _lanes_for_canvas(W, H)
        if lanes > 1:
            def requant_images():
                from guetzli_tpu.metric.comparator import (
                    _requant_compare_images)
                from guetzli_tpu.metric.frequencies import PsychoImage
                bases = jnp.zeros((lanes, 3, H // 8, W // 8, 64),
                                  jnp.int32)
                qs = jnp.ones((lanes, nslots, 3, 64), jnp.int32)
                pi0s = PsychoImage(
                    lf=jnp.zeros((lanes, 3, H, W), jnp.float32),
                    mf=jnp.zeros((lanes, 3, H, W), jnp.float32),
                    hf=jnp.zeros((lanes, 2, H, W), jnp.float32),
                    uhf=jnp.zeros((lanes, 2, H, W), jnp.float32))
                hs = jnp.full((lanes,), h, jnp.int32)
                ws = jnp.full((lanes,), w, jnp.int32)
                # _requant_compare_images is already jitted at module
                # level; .lower() compiles without executing.
                cmp_mod._requant_compare_images.lower(
                    bases, qs, pi0s, hs, ws, W, H, (1, 1, 1),
                    fp.bucket_key(H, W) not in
                    fp._BROKEN_BUCKETS).compile()
            check(f"{bname}/requant_images_lanes{lanes}_B{nslots}",
                  requant_images)

        # zeroing greedy kernel (the other Pallas program in the encode):
        # compile-only at the dispatcher's piece sizes, honoring this
        # tool's no-execution contract (run_chunked would execute).
        def zeroing_sig():
            from guetzli_tpu.search import zeroing
            nb = (H // 8) * (W // 8)
            for piece in sorted(set(zeroing._piece_sizes(
                    nb, zeroing.ZEROING_CHUNK))):
                cur = jnp.zeros((piece, 3, 64), jnp.int32)
                orig = jnp.zeros((piece, 3, 64), jnp.int32)
                xyb0 = jnp.zeros((piece, 3, 8, 8), jnp.float32)
                mask3 = jnp.ones((piece, 3), jnp.float32)
                vw = jnp.full((piece,), 8, jnp.int32)
                vh = jnp.full((piece,), 8, jnp.int32)
                lim = jnp.ones((piece,), jnp.float32)
                zeroing.compute_zeroing_order_batch.lower(
                    cur, orig, xyb0, mask3, vw, vh, lim, steps=64,
                    lookahead=3, new_model=True).compile()
        check(f"{bname}/zeroing_steps64", zeroing_sig)

    print(json.dumps({"total_failures": len(failures),
                      "failed": failures}), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
