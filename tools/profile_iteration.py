"""Per-iteration cost breakdown of the refine chunk on the real TPU.

Times, at the bees q95 setup (or a synthetic one of a given canvas):
  1. the fused compare alone (metric + weights), XLA vs Pallas kernel
  2. one refine_chunk iteration (K=1 chunk) — metric + stopping rule
  3. a K=16 chunk (per-iteration amortized)

This is the measurement that decides where the next per-iteration
optimization goes (metric kernel / bisection / entropy window sums).
Usage: python tools/profile_iteration.py [--canvas 480x304]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--mpix1", action="store_true",
                    help="profile at the ~1 MPix bucket (mosaic of the "
                         "photo) instead of the bees canvas")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    repo = pathlib.Path(__file__).resolve().parent.parent
    jax.config.update("jax_compilation_cache_dir",
                      str(repo / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from PIL import Image
    from guetzli_tpu.metric.comparator import (ButteraugliComparatorTPU,
                                               _compare_coeffs_fused_dyn)
    from guetzli_tpu.jpeg.encoder import encode_rgb_to_jpeg_data
    from guetzli_tpu.search import refine_device as rd

    rgb = np.asarray(Image.open(repo / "tests" / "data" / "bees.png")
                     .convert("RGB"))
    if args.mpix1:
        from tools.bench_configs import mosaic
        rgb = mosaic(rgb, 810, 1280)          # ~1.04 MPix
    h, w = rgb.shape[:2]
    cmp_ = ButteraugliComparatorTPU(rgb, 0.9718)
    jpg = encode_rgb_to_jpeg_data(rgb)
    nby, nbx = -(-h // 8), -(-w // 8)
    coeff_list = [np.asarray(c.coeffs, np.int32).reshape(nby, nbx, 64) * 8
                  for c in jpg.components]
    coeffs = jnp.asarray(np.stack([cmp_.pad_comp_grid(c, 1)
                                   for c in coeff_list]))

    def timed(fn, label, reps):
        fn()                                  # compile/warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{label:40s} median {med*1000:8.2f} ms  "
              f"best {min(ts)*1000:8.2f} ms")
        return med

    # cmp_.fused is the complete decision (eligibility AND hardware
    # probe AND sp gating) — don't re-derive it here.
    fused_opts = (False, True) if cmp_.fused else (False,)

    # 1. fused compare alone
    for fused in fused_opts:
        def cmp_once(fused=fused):
            _, packed = _compare_coeffs_fused_dyn(
                coeffs, cmp_._pi0, jnp.float32(0.9718), jnp.int32(h),
                jnp.int32(w), cmp_.wb, cmp_.hb, (1, 1, 1), 1,
                fused=fused)
            np.asarray(packed)
        timed(cmp_once, f"compare (fused={fused})", args.reps)

    # 2./3. refine chunks at K=1 and K=16, bisect levels 1 and 3
    nbyb, nbxb = cmp_.hb // 8, cmp_.wb // 8
    nb = nbyb * nbxb
    steps = 192
    rng = np.random.default_rng(0)
    init192 = np.zeros((nb, 192), np.int32)
    grid = np.stack([cmp_.pad_comp_grid(c, 1) for c in coeff_list])
    init192[:, :] = grid.transpose(1, 2, 0, 3).reshape(nb, 192)
    cand_idx = np.zeros((nb, steps), np.int32)
    cand_count = np.zeros(nb, np.int32)
    for b in range(nb):
        nzs = [i for i in range(192) if i % 64 and init192[b, i]]
        rng.shuffle(nzs)
        nzs = nzs[:steps]
        cand_idx[b, :len(nzs)] = nzs
        cand_count[b] = len(nzs)
    prec = np.zeros((nb, steps), bool)
    cand_err = np.sort(rng.random((nb, steps)).astype(np.float32), 1)
    zero_order, cand_zpos, zero_order_nat = rd.zeroing_order_tables(
        cand_idx, cand_count, prec)
    row_valid = np.zeros((nbyb, nbxb), bool)
    row_valid[:-(-h // 8) or None, :-(-w // 8) or None] = True

    consts = rd.RefineConsts(
        cand_idx=jnp.asarray(cand_idx), cand_err=jnp.asarray(cand_err),
        cand_count=jnp.asarray(cand_count),
        init192=jnp.asarray(init192),
        init_at_cand=jnp.asarray(
            init192[np.arange(nb)[:, None], cand_idx]),
        prec=jnp.asarray(prec),
        quant_zz=jnp.asarray(np.full((3, 63), 8, np.int32)),
        depths=jnp.asarray(rng.integers(1, 17, (3, 256)).astype(
            np.int32)),
        pad_eob_bits=jnp.zeros(3, jnp.int32),
        frozen_fudged=jnp.int32(0), header_dc=jnp.int32(600),
        base_size=jnp.float32(40000.0), target=jnp.float32(0.9718),
        wtarget=jnp.float32(0.9718), block_limit=jnp.float32(0.9718),
        stop_threshold=jnp.float32(np.inf), pi0=cmp_._pi0,
        frozen_coeffs=(),
        valid_h=jnp.int32(h), valid_w=jnp.int32(w),
        row_valid=jnp.asarray(row_valid.reshape(-1)),
        zero_order=jnp.asarray(zero_order),
        cand_zpos=jnp.asarray(cand_zpos),
        zero_order_nat=jnp.asarray(zero_order_nat))

    for fused in fused_opts:
        for blv in (1, 3):
            for k in (1, 16):
                cfg = rd.RefineCfg(
                    nb, steps, cmp_.wb, cmp_.hb, (1, 1, 1), 1, 7,
                    k_iters=k, bucketed=True, fused=fused,
                    bisect_group=blv)

                def chunk(cfg=cfg):
                    carry = rd.init_carry(nb, 2.0)._replace(
                        direction=jnp.int32(1))
                    _, pulled = rd.refine_chunk(carry, consts, cfg)
                    np.asarray(pulled)
                t = timed(chunk,
                          f"chunk K={k} fused={fused} blevels={blv}",
                          max(3, args.reps // 4))


if __name__ == "__main__":
    main()
