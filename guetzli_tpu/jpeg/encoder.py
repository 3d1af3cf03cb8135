"""RGB -> JPEGData bootstrap (quant = all ones).

Reference: guetzli/jpeg_data_encoder.cc:66-135. Builds the initial YUV444
JPEGData whose coefficients are the raw (x16-descaled) DCT values; the
optimizer imposes real quantization later. All transforms run batched on
device with bit-exact integer semantics (validated in test_transforms).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from guetzli_tpu.jpeg.data import JPEGData, init_yuv444
from guetzli_tpu.ops import color, dct, quantize


@jax.jit
def _bootstrap_tiles(tiles_u8: jax.Array, quant: jax.Array) -> jax.Array:
    """(N, 8, 8, 3) uint8 RGB tiles -> (3, N, 64) quantized coefficients,
    as ONE device program. Eager execution of the ~100-primitive integer
    DCT butterfly paid a tunnel dispatch per op (~minutes per encode on
    the axon link); under jit it is one launch. The block axis N is
    bucket-padded by the caller so a handful of compiled variants serve
    every image size."""
    yuv = color.rgb_to_yuv16(tiles_u8)               # (N, 8, 8, 3)
    blocks = jnp.transpose(yuv, (3, 0, 1, 2))        # (3, N, 8, 8)
    out16 = dct.fdct_exact(blocks)
    return quantize.encoder_quantize(
        out16.reshape(3, -1, 64), quant[:, None, :])


def encode_rgb_to_jpeg_data(rgb: np.ndarray,
                            quant: np.ndarray | None = None) -> JPEGData:
    """(H, W, 3) uint8 -> JPEGData (YUV444, quant defaults to all-ones)."""
    h, w = rgb.shape[:2]
    if not (0 < w < (1 << 16) and 0 < h < (1 << 16)):
        raise ValueError(f"bad dimensions {w}x{h}")
    jpg = init_yuv444(w, h)
    # Canned JFIF APP0 marker payload (reference AddApp0Data).
    jpg.app_data.append(bytes([
        0xE0, 0x00, 0x10, 0x4A, 0x46, 0x49, 0x46, 0x00,
        0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00]))
    if quant is None:
        quant = np.ones((3, 64), dtype=np.int32)
    for c in range(3):
        jpg.quant[c].values = np.asarray(quant[c], dtype=np.int32).copy()

    nbx, nby = jpg.MCU_cols, jpg.MCU_rows
    padded = np.pad(rgb, ((0, nby * 8 - h), (0, nbx * 8 - w), (0, 0)),
                    mode="edge")
    n = nby * nbx
    # (nby*8, nbx*8, 3) -> (N, 8, 8, 3) tiles on the host, block axis
    # padded to a power-of-two bucket (floor 256) so every image size
    # lands in one of a handful of compiled _bootstrap_tiles variants.
    tiles = np.ascontiguousarray(
        padded.reshape(nby, 8, nbx, 8, 3).transpose(0, 2, 1, 3, 4)
        .reshape(n, 8, 8, 3))
    nb = 1 << max(8, (n - 1).bit_length())
    if nb != n:
        tiles = np.concatenate(
            [tiles, np.zeros((nb - n, 8, 8, 3), np.uint8)])
    coeffs = _bootstrap_tiles(jnp.asarray(tiles),
                              jnp.asarray(quant, jnp.int32))
    coeffs = np.asarray(coeffs)[:, :n].astype(np.int16)
    for c in range(3):
        jpg.components[c].coeffs = coeffs[c]
    return jpg
