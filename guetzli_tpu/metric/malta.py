"""Malta line detectors: 16-direction 9x9 stencils.

Reference: third_party/butteraugli/butteraugli.cc:914-1595 (MaltaUnit /
MaltaUnit(LF) / MaltaDiffMapImpl). Each unit sums the scaled difference
image along 16 short line segments and accumulates the squared sums.

TPU design: instead of a per-pixel stencil loop, all 16 patterns form one
(16,1,9,9) convolution (zero padding == the reference's border handling);
the result is the channelwise sum of squares. XLA lowers this to an MXU
conv; a Pallas kernel can replace it later if profiling warrants.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# (dy, dx) offsets per pattern; transcribed from MaltaUnit (butteraugli.cc:
# 1146-1424). 9- and 7/8-point lines.
MALTA_PATTERNS = [
    [(0, d) for d in range(-4, 5)],
    [(d, 0) for d in range(-4, 5)],
    [(-3, -3), (-2, -2), (-1, -1), (0, 0), (1, 1), (2, 2), (3, 3)],
    [(-3, 3), (-2, 2), (-1, 1), (0, 0), (1, -1), (2, -2), (3, -3)],
    [(-4, 1), (-3, 1), (-2, 1), (-1, 0), (0, 0), (1, 0), (2, -1), (3, -1),
     (4, -1)],
    [(-4, -1), (-3, -1), (-2, -1), (-1, 0), (0, 0), (1, 0), (2, 1), (3, 1),
     (4, 1)],
    [(-1, -4), (-1, -3), (-1, -2), (0, -1), (0, 0), (0, 1), (1, 2), (1, 3),
     (1, 4)],
    [(1, -4), (1, -3), (1, -2), (0, -1), (0, 0), (0, 1), (-1, 2), (-1, 3),
     (-1, 4)],
    [(-3, -2), (-2, -1), (-1, -1), (0, 0), (1, 1), (2, 1), (3, 2)],
    [(-3, 2), (-2, 1), (-1, 1), (0, 0), (1, -1), (2, -1), (3, -2)],
    [(-2, -3), (-1, -2), (-1, -1), (0, 0), (1, 1), (1, 2), (2, 3)],
    [(-2, 3), (-1, 2), (-1, 1), (0, 0), (1, -1), (1, -2), (2, -3)],
    [(2, -4), (2, -3), (1, -2), (1, -1), (0, 0), (0, 1), (-1, 2), (-1, 3)],
    [(-2, -4), (-2, -3), (-1, -2), (-1, -1), (0, 0), (0, 1), (1, 2), (1, 3)],
    [(-4, -2), (-3, -2), (-2, -1), (-1, -1), (0, 0), (1, 0), (2, 1), (3, 1)],
    [(-4, 2), (-3, 2), (-2, 1), (-1, 1), (0, 0), (1, 0), (2, -1), (3, -1)],
]

# LF variant (MaltaUnit(MaltaTagLF), butteraugli.cc:914-1144): sparser
# 5-point lines at double stride.
MALTA_PATTERNS_LF = [
    [(0, -4), (0, -2), (0, 0), (0, 2), (0, 4)],
    [(-4, 0), (-2, 0), (0, 0), (2, 0), (4, 0)],
    [(-3, -3), (-2, -2), (0, 0), (2, 2), (3, 3)],
    [(-3, 3), (-2, 2), (0, 0), (2, -2), (3, -3)],
    [(-4, 1), (-2, 1), (0, 0), (2, -1), (4, -1)],
    [(-4, -1), (-2, -1), (0, 0), (2, 1), (4, 1)],
    [(-1, -4), (-1, -2), (0, 0), (1, 2), (1, 4)],
    [(1, -4), (1, -2), (0, 0), (-1, 2), (-1, 4)],
    [(-3, -2), (-2, -1), (0, 0), (2, 1), (3, 2)],
    [(-3, 2), (-2, 1), (0, 0), (2, -1), (3, -2)],
    [(-2, -3), (-1, -2), (0, 0), (1, 2), (2, 3)],
    [(-2, 3), (-1, 2), (0, 0), (1, -2), (2, -3)],
    [(2, -4), (1, -2), (0, 0), (-1, 2), (-2, 4)],
    [(-2, -4), (-1, -2), (0, 0), (1, 2), (2, 4)],
    [(-4, -2), (-2, -1), (0, 0), (2, 1), (4, 2)],
    [(-4, 2), (-2, 1), (0, 0), (2, -1), (4, -2)],
]


@functools.lru_cache(maxsize=2)
def _kernels(lf: bool) -> np.ndarray:
    pats = MALTA_PATTERNS_LF if lf else MALTA_PATTERNS
    k = np.zeros((16, 1, 9, 9), dtype=np.float32)
    for p, offs in enumerate(pats):
        for dy, dx in offs:
            k[p, 0, dy + 4, dx + 4] = 1.0
    return k


def malta_sum_of_squares(diffs: jax.Array, lf: bool) -> jax.Array:
    """(H, W) scaled diff image -> (H, W) sum over the 16 patterns of the
    squared line sums (zero-padded borders)."""
    return malta_sum_of_squares_batch(diffs[None], lf)[0]


def malta_sum_of_squares_batch(diffs: jax.Array, lf: bool) -> jax.Array:
    """(N, H, W) scaled diff images -> (N, H, W). On TPU this runs as a
    Pallas kernel (VMEM-resident shifted-adds — the conv lowering is
    launch-overhead-bound); elsewhere, one batched conv launch for all N
    planes."""
    if jax.default_backend() == "tpu":
        from guetzli_tpu.metric.malta_pallas import (
            malta_sum_of_squares_pallas)
        return malta_sum_of_squares_pallas(diffs, lf)
    x = diffs[:, None, :, :]
    kern = jnp.asarray(_kernels(lf))
    sums = jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding=[(4, 4), (4, 4)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(sums * sums, axis=1)


def malta_scaled_diffs(lum0: jax.Array, lum1: jax.Array, w_0gt1: float,
                       w_0lt1: float, norm1: float, mulli: float
                       ) -> jax.Array:
    """The per-pixel scaled difference feeding the stencils, including the
    asymmetric too-small/too-big objectives
    (reference butteraugli.cc:1468-1529)."""
    len_ = 3.75
    k_w0 = 0.5
    k_w1 = 0.33
    w_pre0gt1 = mulli * np.sqrt(k_w0 * w_0gt1) / (len_ * 2 + 1)
    w_pre0lt1 = mulli * np.sqrt(k_w1 * w_0lt1) / (len_ * 2 + 1)
    norm2_0gt1 = np.float32(w_pre0gt1 * norm1)
    norm2_0lt1 = np.float32(w_pre0lt1 * norm1)

    absval = 0.5 * jnp.abs(lum0) + 0.5 * jnp.abs(lum1)
    diff = lum0 - lum1
    scaler = norm2_0gt1 / (np.float32(norm1) + absval)
    diffs = scaler * diff

    scaler2 = norm2_0lt1 / (np.float32(norm1) + absval)
    fabs0 = jnp.abs(lum0)
    too_small = 0.55 * fabs0
    too_big = 1.05 * fabs0

    # impact magnitude per the four half-open branches; sign follows diff.
    neg_case = jnp.where(
        lum1 > -too_small, scaler2 * (lum1 + too_small),
        jnp.where(lum1 < -too_big, scaler2 * (-lum1 - too_big), 0.0))
    pos_case = jnp.where(
        lum1 < too_small, scaler2 * (too_small - lum1),
        jnp.where(lum1 > too_big, scaler2 * (lum1 - too_big), 0.0))
    impact = jnp.where(lum0 < 0, neg_case, pos_case)
    diffs = diffs + jnp.where(diff < 0, -impact, impact)
    return diffs


def malta_diff_map(lum0: jax.Array, lum1: jax.Array, w_0gt1: float,
                   w_0lt1: float, norm1: float) -> jax.Array:
    """Full-resolution Malta distortion map (MaltaTag variant)."""
    diffs = malta_scaled_diffs(lum0, lum1, w_0gt1, w_0lt1, norm1,
                               mulli=0.354191303559)
    return malta_sum_of_squares(diffs, lf=False)


def malta_diff_map_lf(lum0: jax.Array, lum1: jax.Array, w_0gt1: float,
                      w_0lt1: float, norm1: float) -> jax.Array:
    """LF variant (MaltaTagLF)."""
    diffs = malta_scaled_diffs(lum0, lum1, w_0gt1, w_0lt1, norm1,
                               mulli=0.405371989604)
    return malta_sum_of_squares(diffs, lf=True)
