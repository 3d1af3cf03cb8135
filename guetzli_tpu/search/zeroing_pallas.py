"""Pallas TPU mega-kernel for the 444 zeroing greedy search.

The jnp/XLA version of the per-block greedy (zeroing.py) compiles to
~600 HLO ops PER GREEDY STEP (3 lookahead evaluations x the full
IDCT -> color -> linear -> opsin -> DFT/CSF tile pipeline), and the
per-op dispatch overhead dominates: ~19 s of a 45 s 1 MPix encode.
This kernel runs the ENTIRE greedy loop for a tile of blocks inside one
Pallas program — zero per-op overhead, VMEM-resident state.

Layout: blocks on the LANE axis (B per grid step), pixel index y*8+x on
SUBLANES. Every 8x8 separable transform (integer IDCT passes, the
sigma=1.2 tile blur, the 8x8 real DFT) becomes a constant 64x64 matmul
in Kronecker form; integer stages that must be bit-exact (IDCT, color)
are unrolled 8-term integer FMAs over row groups.

Numerics note: the f32 stages (blur, opsin, DFT) sum in matmul order
instead of XLA's conv order, so block errors can differ from the jnp
path in final ulps — candidate ORDER may swap between near-ties. The
e2e contract (oracle distance/size) is unaffected; CPU backends keep
the jnp path, so CPU goldens are unchanged.

Reference semantics: guetzli/processor.cc:364-467 ComputeBlockZeroingOrder
via the batched formulation in zeroing.py (which remains the oracle for
this kernel's parity test, run in interpret mode).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from guetzli_tpu.metric.block_diff import _csf_weights, _DFT_C, _DFT_S
from guetzli_tpu.ops.blur import _kernel_np, _weights_np
from guetzli_tpu.ops.dct import IDCT_MATRIX_INT
from guetzli_tpu.metric.opsin import (OPSIN_MIX, _GAMMA_PIECE_COEF,
                                      _GAMMA_PIECE_TLO, _GAMMA_PIECE_THI,
                                      _GAMMA_PIECE_DEG, _GAMMA_MIN)

BLOCK_TILE = 512      # blocks per grid step (lane dim)
# Grid steps run sequentially on the single TensorCore and each greedy
# step inside one is latency- (not throughput-) bound, so wider tiles
# cut the sequential step count almost linearly: 128 -> 512 lanes is
# ~4x fewer grid steps for ~the same per-step latency. VMEM at 512:
# ~15 live (192, 512) f32 planes = ~5.9 MB.
INF = np.float32(1e17)


def _blur_matrix_8() -> np.ndarray:
    """(8, 8) f32: one separable pass of the sigma=1.2 blur on an
    8-sample axis, border renormalization included (identical math to
    ops.blur on an 8x8 image)."""
    k = _kernel_np(1.2).astype(np.float64)
    inv = 1.0 / ((1.0) * np.convolve(np.ones(8), k, mode="same"))
    m = np.zeros((8, 8))
    r = len(k) // 2
    for i in range(8):
        for j in range(8):
            d = j - i + r
            if 0 <= d < len(k):
                m[i, j] = k[d]
        m[i] *= inv[i]
    return m.astype(np.float32)


def _kron_IM(m: np.ndarray) -> np.ndarray:
    """Row-structure transform: out[y*8+x] = sum_u m[y,u] in[u*8+x]."""
    return np.kron(m, np.eye(8)).astype(np.float32)


def _kron_MI(m: np.ndarray) -> np.ndarray:
    """Col-structure transform: out[y*8+x] = sum_v m[x,v] in[y*8+v]."""
    return np.kron(np.eye(8), m).astype(np.float32)


def _gamma_block(v):
    """gamma_fast inline (opsin.py): piecewise Chebyshev of log gamma."""
    t = jnp.log(jnp.maximum(v, np.float32(_GAMMA_MIN)))
    t = jnp.minimum(t, np.float32(_GAMMA_PIECE_THI[-1]))
    n_pieces = len(_GAMMA_PIECE_TLO)
    piece = jnp.zeros(t.shape, jnp.int32)
    for k in range(1, n_pieces):
        piece = piece + (t >= np.float32(_GAMMA_PIECE_TLO[k])).astype(
            jnp.int32)
    tlo = jnp.zeros_like(t)
    thi = jnp.zeros_like(t)
    for k in range(n_pieces):
        sel = piece == k
        tlo = jnp.where(sel, np.float32(_GAMMA_PIECE_TLO[k]), tlo)
        thi = jnp.where(sel, np.float32(_GAMMA_PIECE_THI[k]), thi)
    x = (2.0 * t - (tlo + thi)) / (thi - tlo)
    b1 = jnp.zeros_like(x)
    b2 = jnp.zeros_like(x)
    for j in range(_GAMMA_PIECE_DEG, 0, -1):
        cj = jnp.zeros_like(x)
        for k in range(n_pieces):
            cj = jnp.where(piece == k, np.float32(_GAMMA_PIECE_COEF[k, j]),
                           cj)
        b1, b2 = 2.0 * x * b1 - b2 + cj, b1
    c0 = jnp.zeros_like(x)
    for k in range(n_pieces):
        c0 = jnp.where(piece == k, np.float32(_GAMMA_PIECE_COEF[k, 0]), c0)
    return jnp.exp(x * b1 - b2 + c0)


def _balanced_digits(m: np.ndarray, bits: int, n_digits: int):
    """Decompose an int matrix into balanced base-2^bits digit matrices
    (|digit| <= 2^(bits-1)), so each digit's f32 matmul with a bounded
    int operand is EXACT (products stay under 2^24)."""
    m = m.astype(np.int64)
    digits = []
    for _ in range(n_digits):
        half = 1 << (bits - 1)
        d = ((m + half) % (1 << bits)) - half
        digits.append(d.astype(np.float32))
        m = (m - d) >> bits
    assert np.all(m == 0)
    return digits


def _transpose64(x):
    """(64, B) viewed as (8, 8, B): swap the two 8-axes (pixel
    transpose), lane axis untouched."""
    b = x.shape[1]
    return x.reshape(8, 8, b).transpose(1, 0, 2).reshape(64, b)


def _wrap16(v):
    return ((v + 32768) & 0xFFFF) - 32768


# Exact integer IDCT as f32 MXU matmuls: pass matrices in Kronecker form,
# split into balanced digits so every f32 product/sum is integral and
# < 2^24 (exact). Column-pass operand is a coefficient (<= 2^13): 2
# digits of 8 bits; row-pass operand is int16: 3 digits of 5 bits.
_IDCT_COL_DIGITS = _balanced_digits(
    np.kron(IDCT_MATRIX_INT, np.eye(8, dtype=np.int64)), 8, 2)
_IDCT_ROW_DIGITS = _balanced_digits(
    np.kron(np.eye(8, dtype=np.int64), IDCT_MATRIX_INT), 5, 3)


def _exact_int_mm(digit_mats, shift_bits: int, x_int):
    """sum_i (D_i @ x) << (i*shift_bits), all in exact f32 -> int32."""
    xf = x_int.astype(jnp.float32)
    acc = None
    for i, d in enumerate(digit_mats):
        part = _f32_mm(d, xf).astype(jnp.int32) << (i * shift_bits)
        acc = part if acc is None else acc + part
    return acc


def _idct_exact_64(c64, col_digits, row_digits):
    """(64, B) int32 natural-order coeffs -> (64, B) int32 pixels;
    bit-identical to ops.dct.idct_exact."""
    col = _exact_int_mm(col_digits, 8, c64)
    col = _wrap16((col + (1 << 10)) >> 11)
    row = _exact_int_mm(row_digits, 5, col)
    row = (row + (257 << 17)) >> 18
    return jnp.clip(row, 0, 255)


def _replicate_edges_64(px, vw, vh):
    """(64, B) pixels + per-block valid dims: replicate the last valid
    row/column outward (ToPixels edge behavior for partial blocks)."""
    # y replication: row-group y <- row-group min(y, vh-1)
    groups = [px[y * 8:(y + 1) * 8, :] for y in range(8)]
    out_groups = []
    for y in range(8):
        g = groups[y]
        for j in range(8):
            take = jnp.minimum(y, vh - 1) == j     # (B,)
            g = jnp.where(take[None, :], groups[j], g)
        out_groups.append(g)
    px = jnp.concatenate(out_groups, axis=0)
    # x replication via transpose
    pxt = _transpose64(px)
    groups = [pxt[x * 8:(x + 1) * 8, :] for x in range(8)]
    out_groups = []
    for x in range(8):
        g = groups[x]
        for j in range(8):
            take = jnp.minimum(x, vw - 1) == j
            g = jnp.where(take[None, :], groups[j], g)
        out_groups.append(g)
    return _transpose64(jnp.concatenate(out_groups, axis=0))


def _f32_mm(k64, x):
    """(64, 64) const @ (64, B) f32 on the MXU, full f32 precision."""
    return jax.lax.dot_general(
        k64, x, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _srgb_to_linear(v):
    lin_seg = v / np.float32(12.92)
    u = (v / np.float32(255.0) + np.float32(0.055)) / np.float32(1.055)
    pow_seg = np.float32(255.0) * jnp.exp(
        np.float32(2.4) * jnp.log(jnp.maximum(u, np.float32(1e-6))))
    return jnp.where(v < 11, lin_seg, pow_seg)


def const_matrices() -> np.ndarray:
    """(11, 64, 64): IDCT digit matrices (2 col + 3 row), blur kron, DFT
    row/col cos/sin krons, csf row."""
    blur_k = (_kron_IM(_blur_matrix_8())
              @ _kron_MI(_blur_matrix_8())).astype(np.float32)
    csf_m = np.zeros((64, 64), np.float32)
    csf_m[0] = _csf_weights().reshape(64)
    return np.stack(_IDCT_COL_DIGITS + _IDCT_ROW_DIGITS
                    + [blur_k, _kron_IM(_DFT_C), _kron_IM(_DFT_S),
                       _kron_MI(_DFT_C.T), _kron_MI(_DFT_S.T), csf_m])


def make_kernel(steps: int, lookahead: int, mode: str = "444"):
    """Builds the Pallas kernel body. mode='444': all three channels
    live; mode='420y': only Y decodes from candidates, Cb/Cr come frozen
    (the 4:2:0 luma masking pass, processor comp_mask=1)."""
    mix = OPSIN_MIX.astype(np.float32)

    def tile_error(cur192, xyb0, mask3, vw, vh, consts, frozen_cbcr):
        col_digits = [consts[i] for i in range(2)]
        row_digits = [consts[i] for i in range(2, 5)]
        (blur_k, dft_c_rows, dft_s_rows, dft_c_cols, dft_s_cols,
         csf_m) = [consts[i] for i in range(5, 11)]
        csf = csf_m[0]
        # integer IDCT + edge replication per channel
        if mode == "444":
            px = [
                _replicate_edges_64(
                    _idct_exact_64(cur192[c * 64:(c + 1) * 64, :],
                                   col_digits, row_digits), vw, vh)
                for c in range(3)]
        else:
            y0 = _replicate_edges_64(
                _idct_exact_64(cur192[0:64, :], col_digits, row_digits),
                vw, vh)
            px = [y0, frozen_cbcr[0], frozen_cbcr[1]]
        # YCbCr -> sRGB (libjpeg-exact integer arithmetic)
        y = px[0]
        cbc = px[1] - 128
        crc = px[2] - 128
        r = jnp.clip(y + ((91881 * crc + 32768) >> 16), 0, 255)
        g = jnp.clip(y + ((-46802 * crc - 22554 * cbc + 32768) >> 16),
                     0, 255)
        b = jnp.clip(y + ((116130 * cbc + 32768) >> 16), 0, 255)
        lin = [_srgb_to_linear(v.astype(jnp.float32)) for v in (r, g, b)]
        # opsin dynamics on the tile
        blurred = [_f32_mm(blur_k, p) for p in lin]
        pre = [mix[c, 0] * blurred[0] + mix[c, 1] * blurred[1]
               + mix[c, 2] * blurred[2] + mix[c, 3] for c in range(3)]
        sens = [_gamma_block(p) / p for p in pre]
        cur = [(mix[c, 0] * lin[0] + mix[c, 1] * lin[1]
                + mix[c, 2] * lin[2] + mix[c, 3]) * sens[c]
               for c in range(3)]
        xyb1 = [cur[0] - cur[1], cur[0] + cur[1], cur[2]]
        # per-channel block diff: DC term + CSF-weighted |DFT|^2
        err = None
        for c in range(3):
            d = xyb0[c * 64:(c + 1) * 64, :] - xyb1[c]
            avg = jnp.sum(d, axis=0, keepdims=True) / 64.0
            dc = 4.0 * avg * avg                       # (1, B)
            cd = _f32_mm(dft_c_rows, d)
            sd = _f32_mm(dft_s_rows, d)
            re = _f32_mm(dft_c_cols, cd) - _f32_mm(dft_s_cols, sd)
            im = _f32_mm(dft_s_cols, cd) + _f32_mm(dft_c_cols, sd)
            p2 = re * re + im * im
            ac = jnp.sum(csf[:, None] * p2, axis=0, keepdims=True)
            term = (dc + ac) * mask3[c:c + 1, :]
            err = term if err is None else err + term
        return jnp.sqrt(jnp.maximum(err, 0.0))[0]      # (B,)

    def kernel(cur_ref, order_ref, nvalid_ref, xyb0_ref, mask3_ref,
               vw_ref, vh_ref, consts_ref, *rest):
        if mode == "444":
            idx_ref, err_ref = rest
            frozen_cbcr = None
        else:
            cb_ref, cr_ref, idx_ref, err_ref = rest
            frozen_cbcr = (cb_ref[0], cr_ref[0])
        consts = consts_ref[...]             # (11, 64, 64) f32
        cur0 = cur_ref[0]                    # (192, B) i32
        order0 = order_ref[0]                # (192, B) i32
        nv = nvalid_ref[0, 0]                # (B,)
        xyb0 = xyb0_ref[0]                   # (192, B) f32
        mask3 = mask3_ref[0]                 # (3, B)
        vw = vw_ref[0, 0]
        vh = vh_ref[0, 0]
        bsz = cur0.shape[1]
        iota192 = jax.lax.broadcasted_iota(jnp.int32, (192, bsz), 0)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (steps, bsz), 0)

        def step(t, state):
            cur, lst, p, idx_seq, err_seq = state
            cands = []
            errs = []
            for j in range(lookahead):
                ci = jnp.sum(jnp.where(iota192 == (p + j)[None, :], lst,
                                       0), axis=0)          # (B,)
                trial = jnp.where(iota192 == ci[None, :], 0, cur)
                e = tile_error(trial, xyb0, mask3, vw, vh, consts,
                               frozen_cbcr)
                navail = nv - t
                e = jnp.where(j < navail, e, INF)
                cands.append(ci)
                errs.append(e)
            best = jnp.zeros_like(cands[0])
            beste = jnp.full_like(errs[0], INF)
            for j in range(lookahead):
                better = errs[j] < beste
                best = jnp.where(better, cands[j], best)
                beste = jnp.where(better, errs[j], beste)
            # index of the chosen lookahead slot (first matching err)
            bidx = jnp.zeros_like(best)
            found = jnp.zeros_like(best, dtype=jnp.bool_)
            for j in range(lookahead):
                hit = (errs[j] == beste) & ~found
                bidx = jnp.where(hit, j, bidx)
                found = found | hit
            active = t < nv                                  # (B,)
            cur = jnp.where(active[None, :]
                            & (iota192 == best[None, :]), 0, cur)
            rolled = jnp.concatenate([lst[-1:, :], lst[:-1, :]], axis=0)
            shift = ((iota192 >= (p + 1)[None, :])
                     & (iota192 <= (p + bidx)[None, :]))
            lst = jnp.where(active[None, :] & shift, rolled, lst)
            p = p + active.astype(p.dtype)
            idx_seq = jnp.where((iota_s == t) & active[None, :],
                                best[None, :], idx_seq)
            err_seq = jnp.where((iota_s == t) & active[None, :],
                                beste[None, :], err_seq)
            return cur, lst, p, idx_seq, err_seq

        init = (cur0, order0, jnp.zeros((bsz,), jnp.int32),
                jnp.zeros((steps, bsz), jnp.int32),
                jnp.full((steps, bsz), INF))
        _, _, _, idx_seq, err_seq = jax.lax.fori_loop(0, steps, step,
                                                      init)
        idx_ref[0] = idx_seq
        err_ref[0] = err_seq

    return kernel


@functools.partial(jax.jit, static_argnames=("steps", "lookahead",
                                             "interpret"))
def zeroing_greedy_pallas(cur, order, n_valid, xyb0, mask3, vw, vh,
                          steps: int, lookahead: int = 3,
                          interpret: bool = False):
    """All blocks' 444 greedy zeroing searches in one Pallas program.

    cur: (N, 192) i32; order: (N, 192) i32 priority order; n_valid (N,);
    xyb0: (N, 3, 64) f32 original opsin tiles; mask3 (N, 3); vw/vh (N,).
    Returns (idx_seq (N, steps) i32, err_seq (N, steps) f32) — raw, the
    caller monotonicizes (zeroing._postprocess)."""
    return _greedy_pallas("444", cur, order, n_valid, xyb0, mask3, vw,
                          vh, None, None, steps, lookahead, interpret)


@functools.partial(jax.jit, static_argnames=("steps", "lookahead",
                                             "interpret"))
def zeroing_greedy_pallas_420y(cur, order, n_valid, xyb0, mask3, vw, vh,
                               cb_tiles, cr_tiles, steps: int,
                               lookahead: int = 3,
                               interpret: bool = False):
    """4:2:0 luma masking pass: Y candidates, frozen dithered chroma
    tiles cb/cr (N, 8, 8) int32."""
    return _greedy_pallas("420y", cur, order, n_valid, xyb0, mask3, vw,
                          vh, cb_tiles, cr_tiles, steps, lookahead,
                          interpret)


def _greedy_pallas(mode, cur, order, n_valid, xyb0, mask3, vw, vh,
                   cb_tiles, cr_tiles, steps, lookahead, interpret):
    n = cur.shape[0]
    bt = BLOCK_TILE
    n_tiles = -(-n // bt)
    pad = n_tiles * bt - n

    def prep(a, fill=0):
        a = jnp.asarray(a)
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])
        # (N, X...) -> (n_tiles, X..., bt): blocks to the lane axis
        a = a.reshape((n_tiles, bt) + a.shape[1:])
        return jnp.moveaxis(a, 1, -1)

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape,
                            (lambda i: (i,) + (0,) * nd),
                            memory_space=pltpu.VMEM)

    cur_t = prep(cur.astype(jnp.int32))                 # (T, 192, bt)
    order_t = prep(order.astype(jnp.int32))
    nv_t = prep(n_valid.astype(jnp.int32))[:, None, :]  # (T, 1, bt)
    xyb0_t = prep(xyb0.reshape(n, 192) if xyb0.ndim != 2 else xyb0)
    mask3_t = prep(mask3.astype(jnp.float32))           # (T, 3, bt)
    vw_t = prep(vw.astype(jnp.int32))[:, None, :]
    vh_t = prep(vh.astype(jnp.int32))[:, None, :]

    args = [cur_t, order_t, nv_t, xyb0_t, mask3_t, vw_t, vh_t]
    in_specs = [spec((192, bt)), spec((192, bt)), spec((1, bt)),
                spec((192, bt)), spec((3, bt)), spec((1, bt)),
                spec((1, bt)),
                pl.BlockSpec((11, 64, 64), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)]
    args.append(jnp.asarray(const_matrices()))
    if mode == "420y":
        cb_t = prep(jnp.asarray(cb_tiles, jnp.int32).reshape(n, 64))
        cr_t = prep(jnp.asarray(cr_tiles, jnp.int32).reshape(n, 64))
        args += [cb_t, cr_t]
        in_specs += [spec((64, bt)), spec((64, bt))]

    kern = make_kernel(steps, lookahead, mode)
    idx, err = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=[spec((steps, bt)), spec((steps, bt))],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, steps, bt), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, steps, bt), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    # (T, steps, bt) -> (N, steps)
    idx = jnp.moveaxis(idx, -1, 1).reshape(n_tiles * bt, steps)[:n]
    err = jnp.moveaxis(err, -1, 1).reshape(n_tiles * bt, steps)[:n]
    return idx, err
