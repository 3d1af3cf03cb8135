"""Per-block coefficient zeroing order — vmapped over every block at once.

Reference: guetzli/processor.cc:364-467 (ComputeBlockZeroingOrder) runs a
greedy lookahead-3 search serially per macroblock, re-measuring a local
butteraugli block error after each trial zero. Because the reference
freezes the mask for the whole pass (StartBlockComparisons) and the block
error is block-local, every block's search is independent — so the TPU
build runs all blocks' greedy searches in lockstep: each step evaluates the
3 best remaining candidates of every block as one batched
IDCT+opsin+FFT/CSF pipeline (MXU matmuls), instead of ~10^5 serial scalar
FFTs.

444 path (comp_mask=7, factor 1): a block's 8x8 pixels depend only on its
own coefficients, so candidate evaluation is exact.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from guetzli_tpu.metric import block_diff
from guetzli_tpu.ops import color, dct
from guetzli_tpu.ops.gamma import srgb8_to_linear
from guetzli_tpu.search.order_tables import BIAS, CSF

LOOKAHEAD = 3
INF = jnp.float32(1e17)


def candidate_scores(cur: jax.Array, orig: jax.Array) -> jax.Array:
    """(N, 3, 64) current + original coeffs -> (N, 192) zeroing priority
    (lower = zero first); invalid slots +inf. New zeroing model:
    |orig| * csf + bias (guetzli/processor.cc:388-389)."""
    csf = jnp.asarray(CSF)
    bias = jnp.asarray(BIAS)
    n = cur.shape[0]
    flat_cur = cur.reshape(n, 192)
    flat_orig = orig.reshape(n, 192)
    score = jnp.abs(flat_orig.astype(jnp.float32)) * csf + bias
    k = jnp.arange(192) % 64
    valid = (flat_cur != 0) & (k != 0)
    return jnp.where(valid, score, INF), valid


def _tile_linear_rgb(coeffs: jax.Array, vw: jax.Array, vh: jax.Array
                     ) -> jax.Array:
    """(3, 64) dequantized coeffs of one 444 block -> (3, 8, 8) linear RGB
    with the reference's edge replication for partial blocks.

    vw/vh: number of valid pixels in this block (1..8)."""
    px = dct.idct_exact(coeffs.reshape(3, 8, 8))        # (3, 8, 8) in 0..255
    ix = jnp.minimum(jnp.arange(8), vw - 1)
    iy = jnp.minimum(jnp.arange(8), vh - 1)
    px = px[:, iy][:, :, ix]
    rgb = color.ycbcr_to_rgb(px[0], px[1], px[2])       # (8, 8, 3)
    return srgb8_to_linear(jnp.transpose(rgb, (2, 0, 1)))


def _eval_err(coeffs: jax.Array, xyb0: jax.Array, mask3: jax.Array,
              vw: jax.Array, vh: jax.Array) -> jax.Array:
    """Block error of one candidate coefficient set vs the original tile."""
    lin = _tile_linear_rgb(coeffs, vw, vh)
    xyb1 = block_diff.opsin_tiles(lin[None])[0]
    d = block_diff.block_diff_xyb(xyb0, xyb1)
    return jnp.sqrt(jnp.maximum(jnp.sum(d * mask3), 0.0))


def _first_k_remaining(remaining: jax.Array, k: int) -> jax.Array:
    """Positions (into the sorted order) of the first k True entries;
    length-k int32, padded with the last position if fewer remain."""
    rank = jnp.cumsum(remaining.astype(jnp.int32)) - 1
    pos = []
    for j in range(k):
        hit = remaining & (rank == j)
        pos.append(jnp.argmax(hit))
    return jnp.stack(pos)


def _zeroing_single(cur: jax.Array, order: jax.Array, n_valid: jax.Array,
                    xyb0: jax.Array, mask3: jax.Array, vw: jax.Array,
                    vh: jax.Array, steps: int, lookahead: int):
    """Greedy zeroing for one block.

    cur: (3, 64) int32; order: (192,) candidate indices sorted by score;
    n_valid: true candidate count. Returns (idx_seq (steps,), err_seq
    (steps,)) with +inf errors past n_valid."""

    def step(t, state):
        cur, remaining, idx_seq, err_seq = state
        pos = _first_k_remaining(remaining, lookahead)   # (L,)
        cand_idx = order[pos]                            # (L,)
        flat = cur.reshape(192)

        def eval_one(ci):
            cand = flat.at[ci].set(0)
            return _eval_err(cand.reshape(3, 64), xyb0, mask3, vw, vh)

        errs = jax.vmap(eval_one)(cand_idx)              # (L,)
        # Invalidate lookahead slots beyond the remaining count.
        navail = jnp.sum(remaining.astype(jnp.int32))
        lane = jnp.arange(lookahead)
        errs = jnp.where(lane < navail, errs, INF)
        best = jnp.argmin(errs)
        best_pos = pos[best]
        best_idx = cand_idx[best]
        active = t < n_valid
        cur = jnp.where(active,
                        flat.at[best_idx].set(0).reshape(3, 64), cur)
        remaining = remaining.at[best_pos].set(
            jnp.where(active, False, remaining[best_pos]))
        idx_seq = idx_seq.at[t].set(jnp.where(active, best_idx, 0))
        err_seq = err_seq.at[t].set(jnp.where(active, errs[best], INF))
        return cur, remaining, idx_seq, err_seq

    remaining = jnp.arange(192) < n_valid
    init = (cur, remaining,
            jnp.zeros(steps, jnp.int32), jnp.full(steps, INF))
    _, _, idx_seq, err_seq = jax.lax.fori_loop(0, steps, step, init)
    return idx_seq, err_seq


@functools.partial(jax.jit, static_argnames=("steps", "lookahead"))
def compute_zeroing_order_batch(cur: jax.Array, orig: jax.Array,
                                xyb0: jax.Array, mask3: jax.Array,
                                valid_w: jax.Array, valid_h: jax.Array,
                                block_error_limit: float,
                                steps: int, lookahead: int = LOOKAHEAD):
    """All blocks' zeroing orders at once.

    cur/orig: (N, 3, 64) int32 (dequantized); xyb0: (N, 3, 8, 8) original
    opsin tiles; mask3: (N, 3); valid_w/h: (N,) valid pixels per block.
    steps: static >= max candidate count over blocks.

    Returns (idx_seq (N, steps) int32, err_seq (N, steps) f32 monotonic,
    counts (N,) int32 after the error-limit cutoff)."""
    scores, valid = candidate_scores(cur, orig)
    order = jnp.argsort(scores, axis=1)                  # (N, 192)
    n_valid = jnp.sum(valid, axis=1)

    idx_seq, err_seq = jax.vmap(
        lambda c, o, nv, x0, m3, w, h: _zeroing_single(
            c, o, nv, x0, m3, w, h, steps, lookahead)
    )(cur, order, n_valid, xyb0, mask3, valid_w, valid_h)

    # Monotonicize (reverse running min), respecting the +inf padding.
    rev_min = jax.lax.cummin(err_seq[:, ::-1], axis=1)[:, ::-1]
    t = jnp.arange(steps)
    in_range = t[None, :] < n_valid[:, None]
    err_mono = jnp.where(in_range, rev_min, INF)
    counts = jnp.sum(err_mono <= block_error_limit, axis=1)
    return idx_seq, err_mono, counts
