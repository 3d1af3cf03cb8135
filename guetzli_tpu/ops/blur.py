"""Butteraugli's quasi-Gaussian blur, MXU matmul form (conv fallback).

Semantics follow the reference (third_party/butteraugli/butteraugli.cc:
145-233): truncated Gaussian kernel of radius max(1, int(2.25*|sigma|)),
separable passes, and border renormalization that linearly interpolates
between the in-range kernel mass and the full mass by `border_ratio`.

Implementation: each separable pass is a banded-matrix product —
``out = Mh @ img @ Mw^T`` with the border renormalization folded into
the (compile-time constant) matrices. On TPU a C=1 1-D convolution pads
the single feature channel to the full lane width (~99% of the VPU/MXU
wasted) and needs two transposes per blur; the matmul form runs on the
MXU at full K and needs none, and is mathematically identical (both are
f32 sums of the same kernel-weighted terms). The conv path is kept as
``GUETZLI_TPU_BLUR=conv`` for A/B tests.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=256)
def _kernel_np(sigma: float) -> np.ndarray:
    m = 2.25
    scaler = -1.0 / (2.0 * sigma * sigma)
    diff = max(1, int(m * abs(sigma)))  # C int truncation
    i = np.arange(-diff, diff + 1, dtype=np.float64)
    return np.exp(scaler * i * i).astype(np.float32)


def _in_range_mass_np(k: np.ndarray, size: int) -> np.ndarray:
    """in_range[i] = sum of kernel taps that land inside [0, size) when the
    kernel is centered at i. (np.convolve mode='same' is NOT usable here:
    it returns length max(size, len(k)), wrong when the kernel is longer
    than the axis.)"""
    r = len(k) // 2
    pref = np.concatenate([[0.0], np.cumsum(k)])
    i = np.arange(size)
    lo = np.clip(np.maximum(i - r, 0) - i + r, 0, len(k))
    hi = np.clip(np.minimum(i + r + 1, size) - i + r, 0, len(k))
    return pref[hi] - pref[lo]


@functools.lru_cache(maxsize=1024)
def _weights_np(sigma: float, size: int, border_ratio: float) -> np.ndarray:
    """Per-position normalization: (1-br) * in-range mass + br * full mass."""
    k = _kernel_np(sigma).astype(np.float64)
    full = k.sum()
    in_range = _in_range_mass_np(k, size)
    w = (1.0 - border_ratio) * in_range + border_ratio * full
    return (1.0 / w).astype(np.float32)


def _conv1d_lastaxis(img: jax.Array, kernel: np.ndarray) -> jax.Array:
    """Zero-padded 'same' correlation along the last axis."""
    k = jnp.asarray(kernel, dtype=img.dtype)
    n = k.shape[0]
    pad = n // 2
    lead = img.shape[:-1]
    x = img.reshape((-1, 1, img.shape[-1]))        # (batch, feature=1, W)
    kern = k[::-1].reshape((1, 1, n))              # conv == correlation here
    out = jax.lax.conv_general_dilated(
        x, kern, window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST)
    return out.reshape(lead + (img.shape[-1],))


@functools.lru_cache(maxsize=256)
def _prefix_np(sigma: float) -> np.ndarray:
    """prefK[j] = sum of the first j kernel taps (f64-accurate)."""
    k = _kernel_np(sigma).astype(np.float64)
    return np.concatenate([[0.0], np.cumsum(k)]).astype(np.float32)


def _weights_dyn(sigma: float, size: int, border_ratio: float,
                 valid: jax.Array) -> jax.Array:
    """Per-position normalization for a dynamic valid length inside a
    static canvas: in-range kernel mass at position i over columns
    [0, valid) via two clamped prefix-table lookups. Identical math to
    _weights_np evaluated at the true size."""
    pref = jnp.asarray(_prefix_np(sigma))
    k = _kernel_np(sigma)
    r = len(k) // 2
    full = float(k.astype(np.float64).sum())
    i = jnp.arange(size, dtype=jnp.int32)
    lo = jnp.maximum(i - r, 0)
    hi = jnp.minimum(i + r, valid - 1)
    in_range = pref[jnp.clip(hi - i + r + 1, 0, len(k))] - \
        pref[jnp.clip(lo - i + r, 0, len(k))]
    in_range = jnp.where(hi >= lo, in_range, 1.0)   # fully out of range
    w = (1.0 - border_ratio) * in_range + border_ratio * full
    return 1.0 / w


@functools.lru_cache(maxsize=1024)
def _band_mat_np(sigma: float, size: int, border_ratio=None) -> np.ndarray:
    """(size, size) banded blur matrix for one separable pass.

    Row i holds the kernel taps reaching position i (zero-pad border).
    With border_ratio given, the per-position renormalization weight is
    folded in (f64 throughout, one f32 cast at the end); with None the
    matrix is the raw band (dynamic-valid path applies traced weights)."""
    k = _kernel_np(sigma).astype(np.float64)
    r = len(k) // 2
    m = np.zeros((size, size), np.float64)
    for i in range(size):
        lo, hi = max(0, i - r), min(size, i + r + 1)
        m[i, lo:hi] = k[lo - i + r:hi - i + r]
    if border_ratio is not None:
        full = k.sum()
        in_range = _in_range_mass_np(k, size)
        m *= (1.0 / ((1.0 - border_ratio) * in_range
                     + border_ratio * full))[:, None]
    return np.ascontiguousarray(m.astype(np.float32))


def _blur_matmul(img: jax.Array, sigma: float, border_ratio: float,
                 valid_hw) -> jax.Array:
    hs, ws = img.shape[-2], img.shape[-1]
    hp = _mm_precision()
    if valid_hw is None:
        mh = jnp.asarray(_band_mat_np(sigma, hs, border_ratio))
        mwt = jnp.asarray(_band_mat_np(sigma, ws, border_ratio).T)
        return jnp.matmul(mh, jnp.matmul(img, mwt, precision=hp),
                          precision=hp)
    h, w = valid_hw
    rowm = (jnp.arange(hs) < h).astype(img.dtype)
    colm = (jnp.arange(ws) < w).astype(img.dtype)
    x = img * rowm[..., :, None] * colm[..., None, :]
    mh = jnp.asarray(_band_mat_np(sigma, hs))
    mwt = jnp.asarray(_band_mat_np(sigma, ws).T)
    out = jnp.matmul(mh, jnp.matmul(x, mwt, precision=hp), precision=hp)
    # Per-position renormalization at the TRUE borders. inv_w is constant
    # within a column and the row pass mixes only rows, so applying both
    # vectors after the two products equals applying each between passes.
    inv_w = _weights_dyn(sigma, ws, border_ratio, w).astype(img.dtype)
    inv_h = _weights_dyn(sigma, hs, border_ratio, h).astype(img.dtype)
    return out * inv_h[..., :, None] * inv_w[..., None, :]


_BLUR_IMPL = os.environ.get("GUETZLI_TPU_BLUR", "matmul")


def _mm_precision():
    """MXU precision for the banded-matmul blurs. HIGHEST is exact-f32
    (6-pass emulation on TPU); GUETZLI_TPU_BLUR_PRECISION=high selects
    the 3-pass variant (~2x faster matmuls, ~1e-6 rel error) for
    measurement runs."""
    import jax as _jax
    return (_jax.lax.Precision.HIGH
            if os.environ.get("GUETZLI_TPU_BLUR_PRECISION") == "high"
            else _jax.lax.Precision.HIGHEST)

# The banded-matmul form does (H+W)*H*W MACs per plane per blur vs the
# conv's ~2*K*H*W: a huge win while the canvas is small enough to be
# dispatch-overhead-bound, a loss (and a memory hog — the band matrices
# are dense (S, S) constants) on multi-megapixel canvases. Crossover
# bounds below keep bees/1 MPix buckets on the MXU and send 4+ MPix
# panorama-class canvases to the conv path.
_MATMUL_MAX_PIXELS = 3 << 20       # ~3.1 MPix canvas
_MATMUL_MAX_DIM = 4096


def _use_matmul(hs: int, ws: int) -> bool:
    return (_BLUR_IMPL == "matmul" and hs * ws <= _MATMUL_MAX_PIXELS
            and max(hs, ws) <= _MATMUL_MAX_DIM)


def blur(img: jax.Array, sigma: float, border_ratio: float = 0.0,
         valid_hw=None) -> jax.Array:
    """Blur of (..., H, W) planes; H, W compile-time static.

    valid_hw=None: the whole canvas is the image (weights are
    host-precomputed f64 constants). valid_hw=(h, w) traced scalars: only
    the top-left (h, w) region is image content — the pad is zeroed
    before each pass and the border renormalization lands at the TRUE
    border, so valid-region results equal an unpadded computation (modulo
    f32 weight evaluation). This is what makes one compiled executable
    serve every image size in a bucket."""
    if _use_matmul(img.shape[-2], img.shape[-1]):
        return _blur_matmul(img, sigma, border_ratio, valid_hw)
    return _blur_conv(img, sigma, border_ratio, valid_hw)


def blur_multi(planes: jax.Array, specs, valid_hw=None) -> jax.Array:
    """Blur each (H, W) plane of a (P, H, W) stack with its OWN
    (sigma, border_ratio) from `specs`, as ONE batched matmul pair.

    Independent blurs at different sigmas (the mask's r0/r1/r2 passes,
    reference butteraugli.cc:1757-1759, and the SameNoiseLevels blur) are
    per-op-overhead-bound when issued separately; with per-plane banded
    matrices they are a single (P, H, H) x (P, H, W) x (P, W, W) einsum
    on the MXU. Falls back to per-plane `blur` under GUETZLI_TPU_BLUR=conv.
    """
    hs, ws = planes.shape[-2], planes.shape[-1]
    if not _use_matmul(hs, ws):
        return jnp.stack([blur(planes[i], s, br, valid_hw)
                          for i, (s, br) in enumerate(specs)])
    hp = _mm_precision()
    if valid_hw is None:
        mh = jnp.stack([jnp.asarray(_band_mat_np(s, hs, br))
                        for s, br in specs])
        mwt = jnp.stack([jnp.asarray(_band_mat_np(s, ws, br).T)
                         for s, br in specs])
        return jnp.einsum("phk,pkv->phv", mh,
                          jnp.einsum("phw,pwv->phv", planes, mwt,
                                     precision=hp), precision=hp)
    h, w = valid_hw
    rowm = (jnp.arange(hs) < h).astype(planes.dtype)
    colm = (jnp.arange(ws) < w).astype(planes.dtype)
    x = planes * rowm[:, None] * colm[None, :]
    mh = jnp.stack([jnp.asarray(_band_mat_np(s, hs)) for s, _ in specs])
    mwt = jnp.stack([jnp.asarray(_band_mat_np(s, ws).T) for s, _ in specs])
    out = jnp.einsum("phk,pkv->phv", mh,
                     jnp.einsum("phw,pwv->phv", x, mwt, precision=hp),
                     precision=hp)
    inv_w = jnp.stack([_weights_dyn(s, ws, br, w) for s, br in specs])
    inv_h = jnp.stack([_weights_dyn(s, hs, br, h) for s, br in specs])
    return out * inv_h[:, :, None].astype(out.dtype) \
               * inv_w[:, None, :].astype(out.dtype)


def _blur_conv(img: jax.Array, sigma: float, border_ratio: float,
               valid_hw) -> jax.Array:
    hs, ws = img.shape[-2], img.shape[-1]
    k = _kernel_np(sigma)
    if valid_hw is None:
        inv_w = jnp.asarray(_weights_np(sigma, ws, border_ratio))
        out = _conv1d_lastaxis(img, k) * inv_w.astype(img.dtype)
        out = jnp.swapaxes(out, -1, -2)
        inv_h = jnp.asarray(_weights_np(sigma, hs, border_ratio))
        out = _conv1d_lastaxis(out, k) * inv_h.astype(img.dtype)
        return jnp.swapaxes(out, -1, -2)

    h, w = valid_hw
    rowm = (jnp.arange(hs) < h).astype(img.dtype)
    colm = (jnp.arange(ws) < w).astype(img.dtype)
    x = img * rowm[:, None] * colm[None, :]
    inv_w = _weights_dyn(sigma, ws, border_ratio, w).astype(img.dtype)
    out = _conv1d_lastaxis(x, k) * inv_w
    out = jnp.swapaxes(out, -1, -2)
    inv_h = _weights_dyn(sigma, hs, border_ratio, h).astype(img.dtype)
    # the horizontal pass wrote nonzero values only in valid columns, but
    # pad ROWS may still carry them; zero before the vertical pass
    out = out * rowm[None, :]
    out = _conv1d_lastaxis(out, k) * inv_h
    return jnp.swapaxes(out, -1, -2)
