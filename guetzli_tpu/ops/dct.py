"""Batched 8x8 DCT/IDCT transforms for TPU.

Three variants, each vectorized over an arbitrary leading block axis:

- fdct_exact:  integer forward DCT, bit-identical to the reference's
  fixed-point butterfly (guetzli/fdct.cc:88-241; output scaled x16). Pure
  int32 elementwise ops -> VPU-friendly, no data-dependent control flow.
- idct_exact:  integer inverse DCT producing the decoded uint8 pixel values,
  bit-identical to the reference (guetzli/idct.cc:29-161) including the
  libjpeg-mimicking +-1 matrix tweaks and int16 wraparound of the column
  pass. Expressed as two int32 matmuls + rounding shifts.
- dct_f / idct_f: the float orthogonal transforms (reference
  guetzli/dct_double.cc:28-87) used by the 4:2:0 downsampling path; einsum
  form so XLA maps them onto the MXU when batched.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# --- float transform matrix: M[u,x] = 0.5*alpha(u)*cos((2x+1)u*pi/16) ---
_x = np.arange(8)
_u = np.arange(8)
DCT_MATRIX_F64 = 0.5 * np.cos((2 * _x[None, :] + 1) * _u[:, None]
                              * np.pi / 16)
DCT_MATRIX_F64[0] *= 1.0 / np.sqrt(2.0)

# --- integer IDCT matrix (13-bit, deliberately off by +-1 in places to
# match libjpeg; values reproduced from guetzli/idct.cc:29-38) ---
IDCT_MATRIX_INT = np.array([
    [8192, 11363, 10703, 9633, 8192, 6437, 4433, 2260],
    [8192, 9633, 4433, -2259, -8192, -11362, -10704, -6436],
    [8192, 6437, -4433, -11362, -8192, 2261, 10704, 9633],
    [8192, 2260, -10703, -6436, 8192, 9633, -4433, -11363],
    [8192, -2260, -10703, 6436, 8192, -9633, -4433, 11363],
    [8192, -6437, -4433, 11362, -8192, -2261, 10704, -9633],
    [8192, -9633, 4433, 2259, -8192, 11362, -10704, 6436],
    [8192, -11363, 10703, -9633, 8192, -6437, 4433, -2260],
], dtype=np.int32)


def dct_f(blocks: jax.Array) -> jax.Array:
    """Float 2-D DCT of (..., 8, 8) pixel blocks."""
    m = jnp.asarray(DCT_MATRIX_F64, dtype=blocks.dtype)
    return jnp.einsum("ux,...xy,vy->...uv", m, blocks, m,
                      precision=jax.lax.Precision.HIGHEST)


def idct_f(blocks: jax.Array) -> jax.Array:
    """Float 2-D inverse DCT of (..., 8, 8) coefficient blocks."""
    m = jnp.asarray(DCT_MATRIX_F64, dtype=blocks.dtype)
    return jnp.einsum("ux,...uv,vy->...xy", m, blocks, m,
                      precision=jax.lax.Precision.HIGHEST)


def _wrap_int16(x: jax.Array) -> jax.Array:
    """Emulates the reference's coeff_t (int16) store."""
    return ((x + 32768) & 0xFFFF) - 32768


def idct_exact(coeffs: jax.Array) -> jax.Array:
    """Integer-exact inverse DCT: (..., 8, 8) int32 dequantized coefficients
    (natural order: coeffs[..., y, x] frequencies) -> (..., 8, 8) int32
    pixel values in [0, 255].

    Column pass: p[y,x] = (sum_u M[y,u] c[u,x] + 1024) >> 11 (int16 store);
    row pass: out[y,x] = clamp((sum_u M[x,u] p[y,u] + 257<<17) >> 18).
    """
    m = jnp.asarray(IDCT_MATRIX_INT)
    c = coeffs.astype(jnp.int32)
    col = jnp.einsum("yu,...ux->...yx", m, c,
                     preferred_element_type=jnp.int32)
    col = _wrap_int16((col + (1 << 10)) >> 11)
    row = jnp.einsum("xu,...yu->...yx", m, col,
                     preferred_element_type=jnp.int32)
    row = (row + (257 << 17)) >> 18
    return jnp.clip(row, 0, 255)


# ---------------------------------------------------------------------------
# Integer-exact forward DCT (reference fixed-point butterfly).
# All constants 15-bit; MULT is (a*b)>>16 on int32 (arithmetic shift).
# ---------------------------------------------------------------------------

_KTABLE04 = np.array([22725, 21407, 19266, 16384, 12873, 8867, 4520])
_KTABLE17 = np.array([31521, 29692, 26722, 22725, 17855, 12299, 6270])
_KTABLE26 = np.array([29692, 27969, 25172, 21407, 16819, 11585, 5906])
_KTABLE35 = np.array([26722, 25172, 22654, 19266, 15137, 10426, 5315])
# Per-row constant table (rows 1/7 pre-scaled by 2C(1), etc.).
_ROW_TABLES = np.stack([_KTABLE04, _KTABLE17, _KTABLE26, _KTABLE35,
                        _KTABLE04, _KTABLE35, _KTABLE26, _KTABLE17]
                       ).astype(np.int32)

_KTAN1 = 13036     # tan(pi/16) in 15-bit
_KTAN2 = 27146     # tan(2pi/16)
_KTAN3M1 = -21746  # tan(3pi/16) - 1
_K2SQRT2 = 23170   # 1/(2 sqrt 2)


def _mult(a, b):
    return (a * b) >> 16


def fdct_exact(blocks: jax.Array) -> jax.Array:
    """Integer-exact forward DCT of (..., 8, 8) int32 blocks (values are the
    YUV16 samples in [-128, 127]); output scaled x16, int32 (fits int16)."""
    x = blocks.astype(jnp.int32)

    # ---- column pass (vectorized over the 8 columns = last axis) ----
    m0, m1, m2, m3 = x[..., 0, :], x[..., 1, :], x[..., 2, :], x[..., 3, :]
    m4, m5, m6, m7 = x[..., 4, :], x[..., 5, :], x[..., 6, :], x[..., 7, :]

    def bfly(a, b):
        # {a,b} <- {a-b, a+b}
        return a - b, a + b

    m0, m7 = bfly(m0, m7)
    m2, m5 = bfly(m2, m5)
    m3, m4 = bfly(m3, m4)
    m1, m6 = bfly(m1, m6)
    m7, m4 = bfly(m7, m4)
    m6, m5 = bfly(m6, m5)

    m4 = m4 << 3
    m5 = m5 << 3
    m4, m5 = bfly(m4, m5)
    out0, out4 = m5, m4

    m7 = m7 << 3
    m6 = m6 << 3
    m3 = m3 << 3
    m0 = m0 << 3

    t4 = _mult(jnp.int32(_KTAN2), m7)
    t5 = _mult(jnp.int32(_KTAN2), m6)
    t4 = t4 - m6
    t5 = t5 + m7
    out2, out6 = t5, t4

    m2 = m2 << 4
    m1 = m1 << 4
    m1, m2 = bfly(m1, m2)
    m2 = _mult(m2, jnp.int32(_K2SQRT2))
    m1 = _mult(m1, jnp.int32(_K2SQRT2))
    m3, m1 = bfly(m3, m1)
    m0, m2 = bfly(m0, m2)

    t7 = m3
    t6 = m1
    m3 = _mult(m3, jnp.int32(_KTAN3M1))
    m1 = _mult(m1, jnp.int32(_KTAN1))
    m3 = m3 + t7
    m1 = m1 + m2
    m1 = m1 + 1   # CORRECT_LSB
    m3 = m3 + 1   # CORRECT_LSB
    t4b = _mult(jnp.int32(_KTAN3M1), m0)
    t5b = _mult(jnp.int32(_KTAN1), m2)
    t4b = t4b + m0
    m0 = m0 - m3
    t7 = t7 + t4b
    t5b = t5b - t6

    out1, out3, out5, out7 = m1, m0, t7, t5b
    cols = jnp.stack([out0, out1, out2, out3, out4, out5, out6, out7],
                     axis=-2)
    cols = _wrap_int16(cols)  # STORE16 into coeff_t between the passes

    # ---- row pass: in[k] = row elements, per-row constant tables ----
    r = cols
    a0 = r[..., 0] + r[..., 7]
    b0 = r[..., 0] - r[..., 7]
    a1 = r[..., 1] + r[..., 6]
    b1 = r[..., 1] - r[..., 6]
    a2 = r[..., 2] + r[..., 5]
    b2 = r[..., 2] - r[..., 5]
    a3 = r[..., 3] + r[..., 4]
    b3 = r[..., 3] - r[..., 4]

    tbl = jnp.asarray(_ROW_TABLES)  # (8, 7), broadcast over rows axis
    C1, C2, C3 = tbl[:, 0], tbl[:, 1], tbl[:, 2]
    C4, C5, C6, C7 = tbl[:, 3], tbl[:, 4], tbl[:, 5], tbl[:, 6]

    c0 = a0 + a3
    c1 = a0 - a3
    c2 = a1 + a2
    c3 = a1 - a2

    def desc(v):
        return v >> 16

    o0 = desc(C4 * (c0 + c2))
    o4 = desc(C4 * (c0 - c2))
    o2 = desc(C2 * c1 + C6 * c3)
    o6 = desc(C6 * c1 - C2 * c3)
    o1 = desc(C1 * b0 + C3 * b1 + C5 * b2 + C7 * b3)
    o3 = desc(C3 * b0 - C7 * b1 - C1 * b2 - C5 * b3)
    o5 = desc(C5 * b0 - C1 * b1 + C7 * b2 + C3 * b3)
    o7 = desc(C7 * b0 - C5 * b1 + C3 * b2 - C1 * b3)

    out = jnp.stack([o0, o1, o2, o3, o4, o5, o6, o7], axis=-1)
    return _wrap_int16(out).astype(jnp.int32)
