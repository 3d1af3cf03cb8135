"""Color transforms with libjpeg-exact integer semantics, batched.

Forward (encode bootstrap): RGB -> signed YUV16 in [-128, 127], identical to
the reference's fixed-point BT.601 (guetzli/jpeg_data_encoder.cc:40-49).
Inverse (decode/pixel mirror): YCbCr -> sRGB via the same rounded fixed-point
products the reference's LUTs encode (guetzli/color_transform.h:22-219) —
computed arithmetically instead of via gathers, which is faster on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rgb_to_yuv16(rgb: jax.Array) -> jax.Array:
    """(..., 3) uint8 RGB -> (..., 3) int32 YUV in [-128, 127]."""
    r = rgb[..., 0].astype(jnp.int32)
    g = rgb[..., 1].astype(jnp.int32)
    b = rgb[..., 2].astype(jnp.int32)
    half = 1 << 15
    y = (19595 * r + 38469 * g + 7471 * b - (128 << 16) + half) >> 16
    u = (-11059 * r - 21709 * g + 32768 * b + half - 1) >> 16
    v = (32768 * r - 27439 * g - 5329 * b + half - 1) >> 16
    return jnp.stack([y, u, v], axis=-1)


def ycbcr_to_rgb(y: jax.Array, cb: jax.Array, cr: jax.Array) -> jax.Array:
    """uint8/int32 YCbCr planes -> (..., 3) int32 sRGB in [0, 255].

    Matches the reference LUT semantics exactly:
      r = y + (91881*(cr-128) + 32768) >> 16        (floor shift)
      b = y + (116130*(cb-128) + 32768) >> 16
      g = y + (-46802*(cr-128) - 22554*(cb-128) + 32768) >> 16
    then clamp to [0, 255].
    """
    y = y.astype(jnp.int32)
    cbc = cb.astype(jnp.int32) - 128
    crc = cr.astype(jnp.int32) - 128
    r = y + ((91881 * crc + 32768) >> 16)
    g = y + ((-46802 * crc - 22554 * cbc + 32768) >> 16)
    b = y + ((116130 * cbc + 32768) >> 16)
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0, 255)
