"""Butteraugli's quasi-Gaussian blur as XLA separable convolutions.

Semantics follow the reference (third_party/butteraugli/butteraugli.cc:
145-233): truncated Gaussian kernel of radius max(1, int(2.25*|sigma|)),
separable passes, and border renormalization that linearly interpolates
between the in-range kernel mass and the full mass by `border_ratio`.

Implementation: zero-padded 1-D convolution + division by a per-position
weight vector (a compile-time constant), applied along each axis. This is
mathematically identical to the reference's scaled-kernel interior +
per-column border normalization, without its interior/border code split.
"""

from __future__ import annotations

import functools

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


@functools.lru_cache(maxsize=1024)
def _weights_np(sigma: float, size: int, border_ratio: float) -> np.ndarray:
    """Per-position normalization: (1-br) * in-range mass + br * full mass."""
    k = _kernel_np(sigma).astype(np.float64)
    full = k.sum()
    in_range = np.convolve(np.ones(size), k, mode="same")
    # np.convolve 'same' centers even/odd the same way as the reference's
    # offset = len//2 for odd-length kernels (ours are always odd).
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
