"""Quantization helpers, exact to the reference's integer semantics."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_nearest(coeffs: jax.Array, quant: jax.Array) -> jax.Array:
    """Round each dequantized coefficient to the nearest multiple of its
    quant value; ties round toward zero (reference guetzli/quantize.h:24-29,
    whose C99 `%` truncates toward zero)."""
    c = coeffs.astype(jnp.int32)
    q = quant.astype(jnp.int32)
    r = c - (c // q) * q                       # python floor-div remainder
    # convert to C truncated remainder: same sign as c
    r = jnp.where((c < 0) & (r != 0), r - q * jnp.sign(q), r)
    delta = jnp.where(2 * r > q, q - r,
                      jnp.where(-2 * r > q, -q - r, -r))
    return c + delta


def quantize_nearest_np(coeffs, quant):
    """Host (numpy) twin of quantize_nearest — the optimizer re-quantizes on
    the host mirror to avoid a device round trip per candidate."""
    import numpy as np
    c = np.asarray(coeffs, dtype=np.int32)
    q = np.asarray(quant, dtype=np.int32)
    r = c - (c // q) * q
    r = np.where((c < 0) & (r != 0), r - q * np.sign(q), r)
    delta = np.where(2 * r > q, q - r,
                     np.where(-2 * r > q, -q - r, -r))
    return c + delta


def encoder_quantize(coeffs16: jax.Array, quant: jax.Array) -> jax.Array:
    """The RGB-bootstrap quantizer: DCT output is x16 fixed point; divide by
    16*quant with rounding via the reciprocal trick (reference
    guetzli/jpeg_data_encoder.cc:28-36: iquant=(2^16+1)/q, >>20)."""
    iq = (65537 // quant.astype(jnp.int32))
    v = coeffs16.astype(jnp.int32)
    return (v * iq + (0x80 << 12)) >> 20
