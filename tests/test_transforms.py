"""Bit-exactness tests for the device transforms vs the reference C++."""

import pathlib
import tempfile

import numpy as np
import pytest

import oracle_util
from guetzli_tpu.ops import color, dct, gamma, quantize


def test_idct_exact_random(rng):
    # Coefficients in the dequantized range the optimizer produces.
    blocks = rng.integers(-2048, 2048, (512, 64), dtype=np.int32)
    blocks[0] = 0
    blocks[1] = 2047
    blocks[2] = -2048
    ref = oracle_util.idct_blocks(blocks.astype(np.int16))
    ours = np.asarray(dct.idct_exact(
        np.asarray(blocks, dtype=np.int32).reshape(-1, 8, 8)))
    assert np.array_equal(ours.reshape(-1, 64), ref.astype(np.int32))


def test_idct_exact_realistic(bees_rgb):
    # Coefficients from a real image (via the oracle bootstrap).
    h, w, _ = bees_rgb.shape
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        bees_rgb.tofile(td / "in.raw")
        oracle_util.run(["encode_rgb_coeffs", w, h, td / "in.raw",
                         td / "c.i16"])
        coeffs = np.fromfile(td / "c.i16", dtype=np.int16).reshape(-1, 64)
    ref = oracle_util.idct_blocks(coeffs)
    ours = np.asarray(dct.idct_exact(
        coeffs.astype(np.int32).reshape(-1, 8, 8)))
    assert np.array_equal(ours.reshape(-1, 64), ref.astype(np.int32))


def test_fdct_exact_random(rng):
    # FDCT input: YUV16 samples in [-128, 127].
    blocks = rng.integers(-128, 128, (512, 64), dtype=np.int32)
    ref = oracle_util.fdct_blocks(blocks.astype(np.int16))
    ours = np.asarray(dct.fdct_exact(
        np.asarray(blocks, dtype=np.int32).reshape(-1, 8, 8)))
    assert np.array_equal(ours.reshape(-1, 64), ref.astype(np.int32))


def test_rgb_bootstrap_exact(bees_rgb):
    """rgb_to_yuv16 + fdct_exact + encoder_quantize == reference
    EncodeRGBToJpeg coefficients (quant=1)."""
    h, w, _ = bees_rgb.shape
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        bees_rgb.tofile(td / "in.raw")
        oracle_util.run(["encode_rgb_coeffs", w, h, td / "in.raw",
                         td / "c.i16"])
        ref = np.fromfile(td / "c.i16", dtype=np.int16)
    nbx, nby = -(-w // 8), -(-h // 8)
    ref = ref.reshape(3, nby * nbx, 64)

    # Edge-replicate to block grid, block, convert, transform.
    ypad = np.pad(bees_rgb, ((0, nby * 8 - h), (0, nbx * 8 - w), (0, 0)),
                  mode="edge")
    yuv = np.asarray(color.rgb_to_yuv16(ypad))          # (H, W, 3)
    blocks = yuv.reshape(nby, 8, nbx, 8, 3).transpose(4, 0, 2, 1, 3)
    blocks = blocks.reshape(3, nby * nbx, 8, 8)
    out16 = np.asarray(dct.fdct_exact(blocks))
    q1 = np.ones(64, dtype=np.int32)
    ours = np.asarray(quantize.encoder_quantize(
        out16.reshape(3, -1, 64), q1))
    assert np.array_equal(ours, ref.astype(np.int32))


def test_dct_float_roundtrip(rng):
    import jax.numpy as jnp
    px = rng.random((32, 8, 8)).astype(np.float32) * 255
    co = dct.dct_f(jnp.asarray(px))
    back = dct.idct_f(co)
    # f32 roundtrip: ~1e-4 absolute on a 0..255 scale
    assert np.max(np.abs(np.asarray(back) - px)) < 1e-3


def test_quantize_nearest_matches_reference_semantics():
    # Exhaustive check against the C formula on a dense grid.
    coeffs = np.arange(-300, 301, dtype=np.int32)
    for q in [1, 2, 3, 7, 16, 17, 255]:
        got = np.asarray(quantize.quantize_nearest(
            coeffs, np.full_like(coeffs, q)))
        for c, g in zip(coeffs.tolist(), got.tolist()):
            r = int(np.fmod(c, q))  # C truncated remainder
            if 2 * r > q:
                want = c + q - r
            elif -2 * r > q:
                want = c - q - r
            else:
                want = c - r
            assert g == want, (c, q, g, want)


def test_ycbcr_to_rgb_against_decode(bees_rgb):
    """Our YCbCr->RGB must match the reference LUT transform; validated via
    the oracle's full-decode of a 444 JPEG (1x1 factors: pixels == IDCT)."""
    import io
    from PIL import Image
    from guetzli_tpu.jpeg import reader

    buf = io.BytesIO()
    Image.fromarray(bees_rgb).save(buf, format="JPEG", quality=95,
                                   subsampling=0)
    jb = buf.getvalue()
    ref_rgb = oracle_util.decode_rgb(jb)
    jpg = reader.parse(jb)
    h, w = jpg.height, jpg.width
    planes = []
    for c in jpg.components:
        q = jpg.quant[c.quant_idx].values
        deq = c.coeffs.astype(np.int32) * q[None, :]
        px = np.asarray(dct.idct_exact(deq.reshape(-1, 8, 8)))
        nby, nbx = c.height_in_blocks, c.width_in_blocks
        plane = px.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(
            nby * 8, nbx * 8)
        planes.append(plane[:h, :w])
    ours = np.asarray(color.ycbcr_to_rgb(planes[0], planes[1], planes[2]))
    assert np.array_equal(ours.astype(np.uint8), ref_rgb)


def test_gamma_table():
    t = gamma.SRGB8_TO_LINEAR
    assert abs(t[0]) < 1e-12
    assert abs(t[255] - 255.0) < 1e-9
    assert abs(t[10] - 10 / 12.92) < 1e-12
