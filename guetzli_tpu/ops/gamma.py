"""sRGB8 -> linear-light lookup.

Same 256-entry table as the reference (guetzli/gamma_correct.cc:23-38):
linear segment below 11, then 255 * ((v/255 + 0.055)/1.055)^2.4. Built in
float64 on host; device side is a 256-gather (or one-hot matmul under vmap).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_i = np.arange(256, dtype=np.float64)
SRGB8_TO_LINEAR = np.where(
    _i < 11, _i / 12.92,
    255.0 * ((_i / 255.0 + 0.055) / 1.055) ** 2.4)


def srgb8_to_linear(srgb8: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8/int sRGB values -> linear-light float (same scale 0..255)."""
    table = jnp.asarray(SRGB8_TO_LINEAR, dtype=dtype)
    return table[srgb8.astype(jnp.int32)]
