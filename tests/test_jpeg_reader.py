"""Parser golden tests: our parse must agree with the reference parser on
coefficients, dimensions, and quant tables for baseline 444/420, restart
markers, and progressive JPEGs."""

import io

import numpy as np
import pytest
from PIL import Image

import oracle_util
from guetzli_tpu.jpeg import reader
from guetzli_tpu.jpeg.error import JpegDecodeError


def _make_jpeg(rgb, **kwargs):
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="JPEG", **kwargs)
    return buf.getvalue()


def _check_against_oracle(jpeg_bytes):
    meta, ref_coeffs = oracle_util.decode_jpg(jpeg_bytes)
    jpg = reader.parse(jpeg_bytes)
    assert jpg.width == meta["width"]
    assert jpg.height == meta["height"]
    assert len(jpg.components) == meta["ncomp"]
    assert jpg.restart_interval == meta["restart"]
    for i, c in enumerate(jpg.components):
        m = meta["comps"][i]
        assert c.width_in_blocks == m["wib"]
        assert c.height_in_blocks == m["hib"]
        assert np.array_equal(
            jpg.quant[c.quant_idx].values, meta["quant"][m["quant"]])
        assert np.array_equal(c.coeffs.reshape(-1), ref_coeffs[i].reshape(-1))
    return jpg


@pytest.mark.parametrize("subsampling,quality", [
    (0, 95), (0, 100), (2, 85), (1, 90),
])
def test_baseline_vs_oracle(bees_rgb, subsampling, quality):
    jb = _make_jpeg(bees_rgb, quality=quality, subsampling=subsampling)
    _check_against_oracle(jb)


def test_progressive_vs_oracle(bees_rgb):
    jb = _make_jpeg(bees_rgb, quality=95, subsampling=0, progressive=True)
    jpg = _check_against_oracle(jb)
    assert len(jpg.scan_info) > 1


def test_progressive_420_vs_oracle(bees_rgb):
    jb = _make_jpeg(bees_rgb, quality=90, subsampling=2, progressive=True)
    _check_against_oracle(jb)


def test_restart_markers(bees_rgb):
    # PIL emits DRI/RSTn markers with the restart_marker_blocks option.
    buf = io.BytesIO()
    Image.fromarray(bees_rgb).save(buf, format="JPEG", quality=90,
                                   restart_marker_blocks=4)
    jb = buf.getvalue()
    jpg = reader.parse(jb)
    if jpg.restart_interval:
        _check_against_oracle(jb)


def test_grayscale(bees_rgb):
    g = np.asarray(Image.fromarray(bees_rgb).convert("L"))
    buf = io.BytesIO()
    Image.fromarray(g).save(buf, format="JPEG", quality=92)
    _check_against_oracle(buf.getvalue())


def test_odd_sizes(rng):
    # Non-multiple-of-8/16 dimensions exercise edge-block handling.
    for (h, w) in [(9, 17), (8, 8), (23, 31), (64, 48)]:
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for sub in (0, 2):
            jb = _make_jpeg(rgb, quality=90, subsampling=sub)
            _check_against_oracle(jb)


def test_garbage_rejected():
    with pytest.raises(JpegDecodeError):
        reader.parse(b"this is not a jpeg file at all..........")
    with pytest.raises(JpegDecodeError):
        reader.parse(b"\xff\xd8\xff\xe0garbage")


def test_truncated_rejected(bees_rgb):
    jb = _make_jpeg(bees_rgb, quality=90)
    with pytest.raises(JpegDecodeError):
        reader.parse(jb[:len(jb) // 2])
