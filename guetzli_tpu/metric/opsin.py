"""Opsin dynamics: linear RGB -> adaptive XYB opsin space.

Reference: third_party/butteraugli/butteraugli.cc:324-366 (OpsinDynamicsImage)
and butteraugli.h:499-615 (OpsinAbsorbance, GammaPolynomial). Sensitivity is
the gamma derivative of the sigma=1.2-blurred image; XYB = (r-g, r+g, b) of
the sensitivity-scaled absorbances.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from guetzli_tpu.ops.blur import blur

# Photopsin absorbance mixing (butteraugli.h:504-534).
OPSIN_MIX = np.array([
    [0.254462330846, 0.488238255095, 0.0635278003854, 1.01681026909],
    [0.195214015766, 0.568019861857, 0.0860755536007, 1.1510118369],
    [0.07374607900105684, 0.06142425304154509, 0.24416850520714256,
     1.20481945273],
], dtype=np.float64)

# Degree-5/5 rational Chebyshev approximation of the visual gamma
# (butteraugli.h:605-615).
_GAMMA_MIN = 0.971783
_GAMMA_MAX = 590.188894
_GAMMA_P = np.array([98.7821300963361, 164.273222212631, 92.948112871376,
                     33.8165311212688, 6.91626704983562, 0.556380877028234])
_GAMMA_Q = np.array([1.0, 1.64339473427892, 0.89392405219969,
                     0.298947051776379, 0.0507146002577288,
                     0.00226495093949756])


def _clenshaw(x: jax.Array, coeffs: np.ndarray) -> jax.Array:
    b1 = jnp.zeros_like(x)
    b2 = jnp.zeros_like(x)
    for i in range(len(coeffs) - 1, 0, -1):
        b1, b2 = 2.0 * x * b1 - b2 + coeffs[i], b1
    return x * b1 - b2 + coeffs[0]


def gamma_polynomial(v: jax.Array) -> jax.Array:
    x01 = (v - _GAMMA_MIN) / (_GAMMA_MAX - _GAMMA_MIN)
    xc = 2.0 * x01 - 1.0
    yp = _clenshaw(xc, _GAMMA_P)
    yq = _clenshaw(xc, _GAMMA_Q)
    return yp / yq


# The Chebyshev/Clenshaw evaluation above cancels catastrophically in f32
# (up to 3% relative near the domain edge). The device path therefore uses a
# log-spaced LUT sampled from the f64 evaluation; linear interpolation error
# is ~1e-8 relative — far below f32 noise.
_GAMMA_LUT_N = 8192
_GAMMA_LO = np.log(_GAMMA_MIN)
_GAMMA_HI = np.log(_GAMMA_MAX + 1.0)
_GAMMA_LUT_X = np.exp(np.linspace(_GAMMA_LO, _GAMMA_HI, _GAMMA_LUT_N))


def _gamma_lut() -> np.ndarray:
    x01 = (_GAMMA_LUT_X - _GAMMA_MIN) / (_GAMMA_MAX - _GAMMA_MIN)
    xc = 2.0 * x01 - 1.0

    def clenshaw64(x, coeffs):
        b1 = np.zeros_like(x)
        b2 = np.zeros_like(x)
        for i in range(len(coeffs) - 1, 0, -1):
            b1, b2 = 2.0 * x * b1 - b2 + coeffs[i], b1
        return x * b1 - b2 + coeffs[0]

    return (clenshaw64(xc, _GAMMA_P) / clenshaw64(xc, _GAMMA_Q)).astype(
        np.float32)


_GAMMA_LUT = _gamma_lut()
_GAMMA_SCALE = (_GAMMA_LUT_N - 1) / (_GAMMA_HI - _GAMMA_LO)


def gamma_lut(v: jax.Array) -> jax.Array:
    """Device gamma: log-spaced table lookup with linear interpolation."""
    table = jnp.asarray(_GAMMA_LUT, dtype=v.dtype)
    ix = (jnp.log(jnp.maximum(v, _GAMMA_MIN)) - _GAMMA_LO) * _GAMMA_SCALE
    ix = jnp.clip(ix, 0.0, _GAMMA_LUT_N - 1.000001)
    base = ix.astype(jnp.int32)
    mix = ix - base.astype(ix.dtype)
    lo = table[base]
    return lo + mix * (table[base + 1] - lo)


# ---------------------------------------------------------------------------
# Gather-free gamma: TPU gathers serialize (they cost ~5 ns/element — the
# entire zeroing kernel was dominated by the two LUT gathers), so the device
# path evaluates log(gamma) as a 6-piece Chebyshev fit in log(v), built here
# in f64 against the exact rational. The pieces concentrate around v~90
# where the reference rational's P and Q share near-common complex roots
# (a sharp bump that a global fit can't resolve). Max relative error vs the
# f64 rational, measured THROUGH jit on the CPU backend: ~4.8e-6 (XLA's
# exp/log contribute most of it; the fit itself is ~5e-7). Still below the
# metric's accumulated f32 noise, but use the measured figure for tolerance
# budgeting.
# ---------------------------------------------------------------------------

_GAMMA_PIECE_BOUNDS = np.array([_GAMMA_MIN, 4.0, 24.0, 64.0, 96.0, 144.0,
                                _GAMMA_MAX + 1.0])
_GAMMA_PIECE_DEG = 11


def _fit_gamma_pieces() -> np.ndarray:
    def clenshaw64(x, coeffs):
        b1 = np.zeros_like(x)
        b2 = np.zeros_like(x)
        for i in range(len(coeffs) - 1, 0, -1):
            b1, b2 = 2.0 * x * b1 - b2 + coeffs[i], b1
        return x * b1 - b2 + coeffs[0]

    def g64(v):
        x = 2 * (v - _GAMMA_MIN) / (_GAMMA_MAX - _GAMMA_MIN) - 1
        return clenshaw64(x, _GAMMA_P) / clenshaw64(x, _GAMMA_Q)

    rows = []
    for a, b in zip(_GAMMA_PIECE_BOUNDS[:-1], _GAMMA_PIECE_BOUNDS[1:]):
        t = np.linspace(np.log(a), np.log(b), 4001)
        c = np.polynomial.chebyshev.Chebyshev.fit(
            t, np.log(g64(np.exp(t))), _GAMMA_PIECE_DEG,
            domain=[t[0], t[-1]])
        rows.append(c.coef)
    return np.asarray(rows, dtype=np.float32)      # (6, deg+1)


_GAMMA_PIECE_COEF = _fit_gamma_pieces()
_GAMMA_PIECE_TLO = np.log(_GAMMA_PIECE_BOUNDS[:-1]).astype(np.float32)
_GAMMA_PIECE_THI = np.log(_GAMMA_PIECE_BOUNDS[1:]).astype(np.float32)


def gamma_fast(v: jax.Array) -> jax.Array:
    """Gather-free gamma: piecewise Chebyshev in log space, pure VPU ops."""
    t = jnp.log(jnp.maximum(v, _GAMMA_MIN))
    t = jnp.minimum(t, float(_GAMMA_PIECE_THI[-1]))
    n_pieces = len(_GAMMA_PIECE_TLO)
    piece = jnp.zeros(t.shape, jnp.int32)
    for k in range(1, n_pieces):
        piece = piece + (t >= float(_GAMMA_PIECE_TLO[k])).astype(jnp.int32)
    # per-element normalized coordinate + coefficient selection by piece
    tlo = jnp.zeros_like(t)
    thi = jnp.zeros_like(t)
    for k in range(n_pieces):
        sel = piece == k
        tlo = jnp.where(sel, float(_GAMMA_PIECE_TLO[k]), tlo)
        thi = jnp.where(sel, float(_GAMMA_PIECE_THI[k]), thi)
    x = (2.0 * t - (tlo + thi)) / (thi - tlo)
    b1 = jnp.zeros_like(x)
    b2 = jnp.zeros_like(x)
    for j in range(_GAMMA_PIECE_DEG, 0, -1):
        cj = jnp.zeros_like(x)
        for k in range(n_pieces):
            cj = jnp.where(piece == k, float(_GAMMA_PIECE_COEF[k, j]), cj)
        b1, b2 = 2.0 * x * b1 - b2 + cj, b1
    c0 = jnp.zeros_like(x)
    for k in range(n_pieces):
        c0 = jnp.where(piece == k, float(_GAMMA_PIECE_COEF[k, 0]), c0)
    return jnp.exp(x * b1 - b2 + c0)


def opsin_absorbance(rgb: jax.Array) -> jax.Array:
    """(3, H, W) linear RGB -> (3, H, W) absorbances."""
    m = jnp.asarray(OPSIN_MIX, dtype=rgb.dtype)
    return (jnp.einsum("co,ohw->chw", m[:, :3], rgb,
                       precision=jax.lax.Precision.HIGHEST)
            + m[:, 3][:, None, None])


def opsin_dynamics_image(rgb: jax.Array, valid_hw=None) -> jax.Array:
    """(3, H, W) linear RGB -> (3, H, W) XYB, with sensitivity adapted to
    the locally blurred intensity. valid_hw: optional traced (h, w) when
    the canvas is a padded size bucket (see ops/blur.py)."""
    blurred = blur(rgb, 1.2, 0.0, valid_hw)
    pre = opsin_absorbance(blurred)
    sensitivity = gamma_fast(pre) / pre
    cur = opsin_absorbance(rgb) * sensitivity
    x = cur[0] - cur[1]
    y = cur[0] + cur[1]
    b = cur[2]
    return jnp.stack([x, y, b])
