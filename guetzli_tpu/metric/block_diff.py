"""Batched per-8x8-block butteraugli difference (the zeroing-search metric).

Reference: guetzli/butteraugli_comparator.cc:77-488 — an 8x8 real FFT of the
XYB difference, weighted by an FFT-domain contrast-sensitivity table and the
precomputed mask at the block corner, plus a DC term.

TPU design: the reference's scalar split-radix FFT per block becomes four
batched 8x8 matmuls per channel (|FFT2(d)|^2 = (CdC^T - SdS^T)^2 +
(CdS^T + SdC^T)^2), vmapped over every block of the image at once — pure
MXU work instead of a serial per-block loop.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from guetzli_tpu.metric.opsin import opsin_dynamics_image

# FFT-domain CSF in the reference's storage order: index i = kx*8 + ky for
# kx in 0..4 (half spectrum), i in [4, 36]
# (guetzli/butteraugli_comparator.cc:93-134).
_CSF8X8 = np.array([
    0.0, 0.0, 0.0, 0.0,
    0.3831134973, 0.676303603859, 1.1550451483, 8.0,
    8.0, 0.692062533689, 0.847511538605, 0.498250875965,
    0.36198671102, 0.308982169883, 0.1312701920435, 4.71274312228,
    1.1550451483, 0.847511538605, 4.71274312228, 0.991205724152,
    1.30229591239, 0.627264168628, 0.4, 0.1312701920435,
    0.676303603859, 0.498250875965, 0.991205724152, 0.5,
    0.3831134973, 0.349686450518, 0.627264168628, 0.308982169883,
    0.3831134973, 0.36198671102, 1.30229591239, 0.3831134973,
    0.323078800177,
])

_GLOBAL_MUL = 0.000064


def _csf_weights() -> np.ndarray:
    """(8, 8) weight grid W[ky, kx] covering the reference's index range."""
    w = np.zeros((8, 8), dtype=np.float64)
    for i in range(4, 37):
        kx, ky = i // 8, i % 8
        w[ky, kx] = _CSF8X8[i]
    return (w * _GLOBAL_MUL).astype(np.float32)


_k = np.arange(8)
_DFT_C = np.cos(2 * np.pi * np.outer(_k, _k) / 8).astype(np.float32)
_DFT_S = np.sin(2 * np.pi * np.outer(_k, _k) / 8).astype(np.float32)


def fft_abs_sq(d: jax.Array) -> jax.Array:
    """(..., 8, 8) real blocks -> (..., 8, 8) |FFT2|^2."""
    c = jnp.asarray(_DFT_C, d.dtype)
    s = jnp.asarray(_DFT_S, d.dtype)
    hi = jax.lax.Precision.HIGHEST

    def m(a, b):
        return jnp.einsum("ky,...yx->...kx", a, b, precision=hi)

    def mt(a, b):
        return jnp.einsum("...ky,xy->...kx", a, b, precision=hi)

    cd = m(c, d)
    sd = m(s, d)
    re = mt(cd, c) - mt(sd, s)
    im = mt(cd, s) + mt(sd, c)
    return re * re + im * im


def block_diff_xyb(xyb0: jax.Array, xyb1: jax.Array) -> jax.Array:
    """(..., 3, 8, 8) opsin blocks -> (..., 3) per-channel block difference
    (DC term + CSF-weighted spectrum of the difference)."""
    d = xyb0 - xyb1
    avg = jnp.mean(d, axis=(-2, -1))
    dc_term = 4.0 * avg * avg
    p = fft_abs_sq(d)
    w = jnp.asarray(_csf_weights(), d.dtype)
    ac_term = jnp.sum(p * w, axis=(-2, -1))
    return dc_term + ac_term


def compare_block_batch(xyb0: jax.Array, xyb1: jax.Array,
                        mask3: jax.Array) -> jax.Array:
    """(N, 3, 8, 8) opsin pairs + (N, 3) corner masks -> (N,) block errors
    (reference CompareBlock: sqrt(sum_c diff_c * mask_c))."""
    diff = block_diff_xyb(xyb0, xyb1)
    return jnp.sqrt(jnp.maximum(jnp.sum(diff * mask3, axis=-1), 0.0))


def opsin_tiles(linear_tiles: jax.Array) -> jax.Array:
    """(N, 3, 8, 8) linear RGB tiles -> opsin XYB tiles (each tile treated
    as its own tiny image, like the reference's per-block pregamma path)."""
    return jax.vmap(opsin_dynamics_image)(linear_tiles)
