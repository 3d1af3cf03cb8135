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

Three pass flavors mirror SelectFrequencyMasking's comp_mask values:
  mask=7 (444):        all 3 channels live, 8x8 tiles
  mask=1 (420 luma):   Y live at factor 1, chroma pixels frozen
  mask=6 (420 chroma): U+V live at factor 2, 16x16 regions via fancy
                       upsample with a frozen 1-px subsampled ring, Y frozen
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from guetzli_tpu.image import output_image as oi
from guetzli_tpu.metric import block_diff
from guetzli_tpu.ops import color, dct
from guetzli_tpu.ops.gamma import srgb8_to_linear_fast as srgb8_to_linear
from guetzli_tpu.search.order_tables import BIAS, CSF

LOOKAHEAD = 3
INF = jnp.float32(1e17)


# Legacy zeroing-model tables (reference processor.cc:369-379): per-zigzag
# CSF divisor + per-channel weight for the pre-"new model" priority.
OLD_CSF = np.array([
    10, 10, 20, 40, 60, 70, 80, 90,
    10, 20, 30, 60, 70, 80, 90, 90,
    20, 30, 60, 70, 80, 90, 90, 90,
    40, 60, 70, 80, 90, 90, 90, 90,
    60, 70, 80, 90, 90, 90, 90, 90,
    70, 80, 90, 90, 90, 90, 90, 90,
    80, 90, 90, 90, 90, 90, 90, 90,
    90, 90, 90, 90, 90, 90, 90, 90], dtype=np.float32)
OLD_WEIGHT = np.array([1.0, 0.22, 0.20], dtype=np.float32)


def candidate_scores(cur: jax.Array, orig: jax.Array, comp_mask: int,
                     new_model: bool = True) -> jax.Array:
    """(N, 3, 64) current + original coeffs -> ((N, 192) priority, valid).
    Lower priority zeroes first; invalid slots +inf. New zeroing model:
    |orig| * csf + bias; legacy: (|orig| - zigzag/64) * weight / oldCsf
    (guetzli/processor.cc:386-393)."""
    n = cur.shape[0]
    flat_cur = cur.reshape(n, 192)
    flat_orig = orig.reshape(n, 192)
    if new_model:
        score = (jnp.abs(flat_orig.astype(jnp.float32)) * jnp.asarray(CSF)
                 + jnp.asarray(BIAS))
    else:
        from guetzli_tpu.jpeg.data import ZIGZAG_ORDER
        zz = np.tile(np.asarray(ZIGZAG_ORDER, np.float32), 3)
        w = np.repeat(OLD_WEIGHT, 64) / np.tile(OLD_CSF, 3)
        score = ((jnp.abs(flat_orig.astype(jnp.float32)) - zz / 64.0)
                 * jnp.asarray(w))
    idx = jnp.arange(192)
    k = idx % 64
    c = idx // 64
    in_mask = (jnp.asarray(comp_mask) >> c) & 1
    valid = (flat_cur != 0) & (k != 0) & (in_mask == 1)
    return jnp.where(valid, score, INF), valid


def _replicate_edges(px: jax.Array, vw: jax.Array, vh: jax.Array
                     ) -> jax.Array:
    """Replicate the last valid row/column outward (the reference's
    ToPixels edge behavior for partial blocks). px: (..., S, S)."""
    s = px.shape[-1]
    ix = jnp.minimum(jnp.arange(s), vw - 1)
    iy = jnp.minimum(jnp.arange(s), vh - 1)
    return px[..., iy, :][..., :, ix]


def _greedy_single(cur_flat: jax.Array, order: jax.Array,
                   n_valid: jax.Array, eval_fn, steps: int,
                   lookahead: int):
    """Greedy zeroing for one block over a flat (192,) coefficient vector;
    eval_fn(flat) -> scalar error.

    The remaining-candidate set is kept as a pointer `p` into a compacted
    copy of `order`: the candidates under consideration at each step are
    exactly list[p:p+lookahead] (the first `lookahead` remaining in the
    ORIGINAL priority order — removing entry p+c shifts the c unchosen
    earlier entries up one slot, preserving order). This replaces the
    previous per-step cumsum+argmax rank scan with a handful of one-hot
    selects, and — like the one-hot coefficient updates — avoids batched
    dynamic scatters, which miscompile inside vmapped fori_loops on this
    backend (>512 blocks: picks repeat forever)."""
    iota = jnp.arange(192)

    def gather(vec, pos):
        # per-row dynamic gather as a one-hot reduction (no scatter/gather)
        return jnp.sum(jnp.where(iota == pos, vec, 0))

    def step(t, state):
        cur, lst, p, idx_seq, err_seq = state
        cand_idx = jnp.stack([gather(lst, p + j)
                              for j in range(lookahead)])
        errs = jax.vmap(lambda ci: eval_fn(
            jnp.where(iota == ci, 0, cur).astype(cur.dtype)))(cand_idx)
        navail = n_valid - t
        errs = jnp.where(jnp.arange(lookahead) < navail, errs, INF)
        best = jnp.argmin(errs)
        best_idx = cand_idx[best]
        active = t < n_valid
        cur = jnp.where(active & (iota == best_idx), 0, cur)
        # compact: shift the unchosen earlier candidates up one slot
        # (positions p+1 .. p+best each take their predecessor's value)
        shift_src = jnp.where((iota >= p + 1) & (iota <= p + best),
                              jnp.roll(lst, 1), lst)
        lst = jnp.where(active, shift_src, lst)
        p = p + active.astype(p.dtype)
        idx_seq = idx_seq.at[t].set(jnp.where(active, best_idx, 0))
        err_seq = err_seq.at[t].set(jnp.where(active, errs[best], INF))
        return cur, lst, p, idx_seq, err_seq

    init = (cur_flat, order.astype(jnp.int32), jnp.int32(0),
            jnp.zeros(steps, jnp.int32), jnp.full(steps, INF))
    _, _, _, idx_seq, err_seq = jax.lax.fori_loop(0, steps, step, init)
    return idx_seq, err_seq


def _postprocess(err_seq, n_valid, steps, block_error_limit):
    """Monotonicize (reverse running min) + error-limit cutoff
    (reference processor.cc:447-459). block_error_limit: scalar, or (N,)
    per-block (batch mode concatenates blocks of images with different
    quality targets)."""
    rev_min = jax.lax.cummin(err_seq[:, ::-1], axis=1)[:, ::-1]
    t = jnp.arange(steps)
    in_range = t[None, :] < n_valid[:, None]
    err_mono = jnp.where(in_range, rev_min, INF)
    lim = jnp.asarray(block_error_limit)
    if lim.ndim == 1:
        lim = lim[:, None]
    counts = jnp.sum(err_mono <= lim, axis=1)
    return err_mono, counts


ZEROING_CHUNK = 2048


def _piece_sizes(n: int, chunk: int) -> list:
    """Descending power-of-two piece sizes (floor 256) covering n blocks.
    1262 -> [1024, 256] (18 pad rows) instead of one 2048 piece (786 pad
    rows): every piece reuses an existing compiled variant, and a single
    rounded-up piece is kept whenever its padding is small (<= half of
    the piece the split would add)."""
    out = []
    rem = max(n, 1)
    while rem > 0:
        if rem >= chunk:
            p = chunk
        else:
            down = 256
            while down * 2 <= rem:
                down *= 2
            up = down if down >= rem else down * 2
            p = up if up - rem <= down // 2 else down
        out.append(p)
        rem -= p
    return out


def run_chunked(kernel, args, limit, steps: int, lookahead: int,
                chunk: int = ZEROING_CHUNK, n_valid=None,
                new_model: bool = True):
    """Runs a zeroing kernel over fixed-size block chunks.

    Every call site (any image size, any batch-mode concatenation) lands in
    one of a handful of compiled executables per `steps` value: the block
    axis is decomposed into power-of-two pieces (floor 256, cap `chunk`).
    Padding rows are all-zero (no candidates, n_valid = 0) so results are
    unaffected. limit: scalar or (N,).

    n_valid (optional, (N,) host ints): per-block candidate counts. Blocks
    are then sorted and bucketed so a block only pays for a greedy loop of
    length >= its own candidate count (64-step buckets) instead of the
    global max — typically 2-3x less device work, identical results.

    All kernel calls are dispatched asynchronously; device->host transfer
    happens in ONE jax.device_get over every piece of every bucket (each
    separate np.asarray pays the full link round trip — 3 pulls x 4
    pieces measured ~0.3 s of a 0.9 s bees zeroing pass)."""
    n = args[0].shape[0]
    if n_valid is not None and n > 0:
        order = np.argsort(np.asarray(n_valid), kind="stable")
        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n)
        nv_sorted = np.asarray(n_valid)[order]
        args_sorted = tuple(np.asarray(a)[order] if isinstance(a, np.ndarray)
                            else jnp.asarray(a)[jnp.asarray(order)]
                            for a in args)
        limit_vec = np.broadcast_to(
            np.asarray(limit, np.float32).reshape(-1), (n,))
        limit_sorted = np.ascontiguousarray(limit_vec[order])
        idx = np.zeros((n, steps), dtype=np.int32)
        err = np.full((n, steps), float(np.asarray(INF)), dtype=np.float32)
        cnt = np.zeros(n, dtype=np.int64)
        spans = []          # (lo, hi, bucket_steps, device triples)
        lo = 0
        while lo < n:
            bucket_steps = min(
                steps, max(64, -(-int(nv_sorted[lo]) // 64) * 64))
            hi = int(np.searchsorted(nv_sorted, bucket_steps, "right"))
            hi = max(hi, lo + 1)
            sub = tuple(a[lo:hi] for a in args_sorted)
            outs = _dispatch_chunks(kernel, sub, limit_sorted[lo:hi],
                                    bucket_steps, lookahead, chunk,
                                    new_model)
            spans.append((lo, hi, bucket_steps, outs))
            lo = hi
        pulled = jax.device_get([s[3] for s in spans])
        for (lo, hi, bsteps, _), outs_np in zip(spans, pulled):
            i, e, c = _assemble(outs_np, hi - lo)
            idx[lo:hi, :bsteps] = i
            err[lo:hi, :bsteps] = e
            cnt[lo:hi] = c
        return idx[inv], err[inv], cnt[inv]

    outs = _dispatch_chunks(kernel, args, limit, steps, lookahead, chunk,
                            new_model)
    return _assemble(jax.device_get(outs), n)


def _dispatch_chunks(kernel, args, limit, steps, lookahead, chunk,
                     new_model):
    """Dispatches one kernel call per power-of-two piece; returns the
    device result triples without blocking."""
    n = args[0].shape[0]
    limit_vec = jnp.broadcast_to(jnp.asarray(limit, jnp.float32), (n,))
    outs = []
    lo = 0
    for piece in _piece_sizes(n, chunk):
        hi = min(lo + piece, n)
        pad = piece - (hi - lo)

        def prep(a):
            part = jnp.asarray(a)[lo:hi]
            if pad:
                part = jnp.concatenate(
                    [part, jnp.zeros((pad,) + part.shape[1:], part.dtype)])
            return part

        chunk_args = tuple(prep(a) for a in args)
        lim = prep(limit_vec)
        outs.append(kernel(*chunk_args, lim, steps, lookahead,
                           new_model))
        lo = hi
    return outs


def _assemble(outs_np, n):
    idx = np.concatenate([o[0] for o in outs_np])[:n]
    err = np.concatenate([o[1] for o in outs_np])[:n]
    cnt = np.concatenate([o[2] for o in outs_np])[:n]
    return idx, err, cnt


# ---------------------------------------------------------------------------
# 444 pass (comp_mask = 7)
# ---------------------------------------------------------------------------

def _tile_linear_rgb_444(coeffs: jax.Array, vw, vh) -> jax.Array:
    px = dct.idct_exact(coeffs.reshape(3, 8, 8))
    px = _replicate_edges(px, vw, vh)
    rgb = color.ycbcr_to_rgb(px[0], px[1], px[2])
    return srgb8_to_linear(jnp.transpose(rgb, (2, 0, 1)))


@functools.partial(jax.jit, static_argnames=("steps", "lookahead",
                                              "new_model"))
def compute_zeroing_order_batch(cur, orig, xyb0, mask3, valid_w, valid_h,
                                block_error_limit, steps,
                                lookahead: int = LOOKAHEAD,
                                new_model: bool = True):
    """All blocks' zeroing orders for the 444 pass.

    cur/orig: (N, 3, 64) int32 dequantized; xyb0: (N, 3, 8, 8) original
    opsin tiles; mask3: (N, 3); valid_w/h: (N,). Returns
    (idx_seq (N, steps), err_seq (N, steps) monotonic, counts (N,))."""
    scores, valid = candidate_scores(cur, orig, 7, new_model)
    order = jnp.argsort(scores, axis=1)
    n_valid = jnp.sum(valid, axis=1)

    if jax.default_backend() == "tpu":
        # Pallas mega-kernel: the whole greedy loop in one program (the
        # XLA form below dispatches ~600 ops per greedy step; per-op
        # overhead made the zeroing pass ~40% of a 1 MPix encode).
        from guetzli_tpu.search.zeroing_pallas import zeroing_greedy_pallas
        idx_seq, err_seq = zeroing_greedy_pallas(
            cur.reshape(-1, 192), order.astype(jnp.int32),
            n_valid.astype(jnp.int32),
            xyb0.reshape(-1, 3, 64).astype(jnp.float32),
            mask3.astype(jnp.float32), valid_w, valid_h, steps,
            lookahead)
    else:
        def one(c, o, nv, x0, m3, w, h):
            def eval_fn(flat):
                lin = _tile_linear_rgb_444(flat.reshape(3, 64), w, h)
                xyb1 = block_diff.opsin_tiles(lin[None])[0]
                d = block_diff.block_diff_xyb(x0, xyb1)
                return jnp.sqrt(jnp.maximum(jnp.sum(d * m3), 0.0))

            return _greedy_single(c.reshape(192), o, nv, eval_fn, steps,
                                  lookahead)

        idx_seq, err_seq = jax.vmap(one)(cur, order, n_valid, xyb0,
                                         mask3, valid_w, valid_h)
    err_mono, counts = _postprocess(err_seq, n_valid, steps,
                                    block_error_limit)
    return idx_seq, err_mono, counts


# ---------------------------------------------------------------------------
# 420 luma pass (comp_mask = 1): Y live, chroma pixels frozen.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("steps", "lookahead",
                                              "new_model"))
def compute_zeroing_order_420_luma(cur_y, orig_y, cb_tiles, cr_tiles,
                                   xyb0, mask3, valid_w, valid_h,
                                   block_error_limit, steps,
                                   lookahead: int = LOOKAHEAD,
                                   new_model: bool = True):
    """cur_y/orig_y: (N, 64); cb/cr_tiles: (N, 8, 8) frozen dithered chroma
    pixels of each Y block's region; rest as in the 444 pass."""
    n = cur_y.shape[0]
    cur3 = jnp.zeros((n, 3, 64), cur_y.dtype).at[:, 0, :].set(cur_y)
    orig3 = jnp.zeros((n, 3, 64), orig_y.dtype).at[:, 0, :].set(orig_y)
    scores, valid = candidate_scores(cur3, orig3, 1, new_model)
    order = jnp.argsort(scores, axis=1)
    n_valid = jnp.sum(valid, axis=1)

    if jax.default_backend() == "tpu":
        from guetzli_tpu.search.zeroing_pallas import (
            zeroing_greedy_pallas_420y)
        idx_seq, err_seq = zeroing_greedy_pallas_420y(
            cur3.reshape(-1, 192), order.astype(jnp.int32),
            n_valid.astype(jnp.int32),
            xyb0.reshape(n, 3, 64).astype(jnp.float32),
            mask3.astype(jnp.float32), valid_w, valid_h,
            cb_tiles, cr_tiles, steps, lookahead)
        err_mono, counts = _postprocess(err_seq, n_valid, steps,
                                        block_error_limit)
        return idx_seq, err_mono, counts

    def one(c, o, nv, cb, cr, x0, m3, w, h):
        def eval_fn(flat):
            y = dct.idct_exact(flat[:64].reshape(8, 8))
            y = _replicate_edges(y, w, h)
            rgb = color.ycbcr_to_rgb(y, cb, cr)
            lin = srgb8_to_linear(jnp.transpose(rgb, (2, 0, 1)))
            xyb1 = block_diff.opsin_tiles(lin[None])[0]
            d = block_diff.block_diff_xyb(x0, xyb1)
            return jnp.sqrt(jnp.maximum(jnp.sum(d * m3), 0.0))

        return _greedy_single(c.reshape(192), o, nv, eval_fn, steps,
                              lookahead)

    idx_seq, err_seq = jax.vmap(one)(cur3, order, n_valid, cb_tiles,
                                     cr_tiles, xyb0, mask3, valid_w,
                                     valid_h)
    err_mono, counts = _postprocess(err_seq, n_valid, steps,
                                    block_error_limit)
    return idx_seq, err_mono, counts


# ---------------------------------------------------------------------------
# 420 chroma pass (comp_mask = 6): U+V at factor 2; a candidate block's
# 16x16 pixel region is fancy-upsampled from its 8x8 subsampled tile plus a
# frozen 1-px ring (neighbors keep their initial state, exactly like the
# reference which restores the image after each block, processor.cc:460-466).
# ---------------------------------------------------------------------------

def _upsample_tile(sub_center: jax.Array, ring: jax.Array) -> jax.Array:
    """sub_center: (8, 8) x16 subsampled values of this block; ring:
    (10, 10) frozen neighborhood (center 8x8 ignored). -> (16, 16) x16."""
    pad = ring.at[1:9, 1:9].set(sub_center)
    c = pad[1:9, 1:9]
    up, down = pad[0:8, 1:9], pad[2:10, 1:9]
    left, right = pad[1:9, 0:8], pad[1:9, 2:10]
    ul, ur = pad[0:8, 0:8], pad[0:8, 2:10]
    dl, dr = pad[2:10, 0:8], pad[2:10, 2:10]
    q00 = (9 * c + 3 * up + 3 * left + ul) >> 4
    q01 = (9 * c + 3 * up + 3 * right + ur) >> 4
    q10 = (9 * c + 3 * down + 3 * left + dl) >> 4
    q11 = (9 * c + 3 * down + 3 * right + dr) >> 4
    out = jnp.zeros((16, 16), sub_center.dtype)
    out = out.at[0::2, 0::2].set(q00)
    out = out.at[0::2, 1::2].set(q01)
    out = out.at[1::2, 0::2].set(q10)
    out = out.at[1::2, 1::2].set(q11)
    return out


@functools.partial(jax.jit, static_argnames=("steps", "lookahead",
                                              "new_model"))
def compute_zeroing_order_420_chroma(cur_uv, orig_uv, rings_u, rings_v,
                                     y_tiles, xyb0_4, mask3_4, subvalid,
                                     xpar16, block_error_limit, steps,
                                     lookahead: int = LOOKAHEAD,
                                     new_model: bool = True):
    """cur_uv/orig_uv: (N, 2, 64) chroma coeffs per factor-2 block;
    rings_u/v: (N, 10, 10) frozen x16 subsampled neighborhoods;
    y_tiles: (N, 16, 16) frozen dithered Y pixels; xyb0_4: (N, 4, 3, 8, 8)
    original opsin of the 4 sub-tiles; mask3_4: (N, 4, 3); subvalid:
    (N, 4) bool which sub-blocks are inside the image; xpar16: (N, 16)
    the (x & 1) dither parity per absolute column."""
    n = cur_uv.shape[0]
    cur3 = jnp.zeros((n, 3, 64), cur_uv.dtype).at[:, 1:, :].set(cur_uv)
    orig3 = jnp.zeros((n, 3, 64), orig_uv.dtype).at[:, 1:, :].set(orig_uv)
    scores, valid = candidate_scores(cur3, orig3, 6, new_model)
    order = jnp.argsort(scores, axis=1)
    n_valid = jnp.sum(valid, axis=1)

    def one(c, o, nv, ru, rv, yt, x0s, m3s, sv, xp):
        def eval_fn(flat):
            cb16 = _upsample_tile(
                dct.idct_exact(flat[64:128].reshape(8, 8)) << 4, ru)
            cr16 = _upsample_tile(
                dct.idct_exact(flat[128:192].reshape(8, 8)) << 4, rv)
            # positional dither with absolute column parity
            cb = (cb16 + 8 - xp[None, :]) >> 4
            cr = (cr16 + 8 - xp[None, :]) >> 4
            rgb = color.ycbcr_to_rgb(yt, cb, cr)
            lin = srgb8_to_linear(jnp.transpose(rgb, (2, 0, 1)))
            tiles = lin.reshape(3, 2, 8, 2, 8).transpose(1, 3, 0, 2, 4)
            tiles = tiles.reshape(4, 3, 8, 8)
            xyb1 = block_diff.opsin_tiles(tiles)
            d = block_diff.block_diff_xyb(x0s, xyb1)       # (4, 3)
            errs = jnp.sqrt(jnp.maximum(jnp.sum(d * m3s, axis=1), 0.0))
            errs = jnp.where(sv, errs, 0.0)
            return jnp.max(errs)

        return _greedy_single(c.reshape(192), o, nv, eval_fn, steps,
                              lookahead)

    idx_seq, err_seq = jax.vmap(one)(cur3, order, n_valid, rings_u,
                                     rings_v, y_tiles, xyb0_4, mask3_4,
                                     subvalid, xpar16)
    err_mono, counts = _postprocess(err_seq, n_valid, steps,
                                    block_error_limit)
    return idx_seq, err_mono, counts
