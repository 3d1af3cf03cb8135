"""Writer golden tests: byte-for-byte parity with the reference serializer
on identical parsed JPEGData, plus decode-roundtrip sanity."""

import io
import pathlib
import subprocess
import tempfile

import numpy as np
import pytest
from PIL import Image

import oracle_util
from guetzli_tpu.jpeg import reader, writer


def _make_jpeg(rgb, **kwargs):
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="JPEG", **kwargs)
    return buf.getvalue()


def _ref_reencode(jpeg_bytes: bytes, strip: bool) -> bytes:
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        (td / "in.jpg").write_bytes(jpeg_bytes)
        oracle_util.run(["reencode", td / "in.jpg", int(strip),
                         td / "out.jpg"])
        return (td / "out.jpg").read_bytes()


@pytest.mark.parametrize("subsampling,quality,strip", [
    (0, 95, True), (0, 95, False), (2, 85, True), (1, 90, True),
    (0, 100, True),
])
def test_byte_parity_vs_reference(bees_rgb, subsampling, quality, strip):
    jb = _make_jpeg(bees_rgb, quality=quality, subsampling=subsampling)
    ref = _ref_reencode(jb, strip)
    ours = writer.serialize(reader.parse(jb), strip_metadata=strip)
    assert ours == ref


def test_byte_parity_progressive_input(bees_rgb):
    # Progressive input parses to the same coefficients; serialization must
    # produce the identical sequential stream.
    jb = _make_jpeg(bees_rgb, quality=92, subsampling=0, progressive=True)
    assert writer.serialize(reader.parse(jb)) == _ref_reencode(jb, True)


def test_byte_parity_grayscale(bees_rgb):
    g = np.asarray(Image.fromarray(bees_rgb).convert("L"))
    buf = io.BytesIO()
    Image.fromarray(g).save(buf, format="JPEG", quality=90)
    jb = buf.getvalue()
    assert writer.serialize(reader.parse(jb)) == _ref_reencode(jb, True)


def test_byte_parity_odd_sizes(rng):
    for (h, w) in [(9, 17), (23, 31), (64, 48)]:
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for sub in (0, 2):
            jb = _make_jpeg(rgb, quality=88, subsampling=sub)
            assert writer.serialize(reader.parse(jb)) == _ref_reencode(
                jb, True)


def test_roundtrip_decodable(bees_rgb):
    jb = _make_jpeg(bees_rgb, quality=95)
    out = writer.serialize(reader.parse(jb))
    im = Image.open(io.BytesIO(out))
    assert im.size == (bees_rgb.shape[1], bees_rgb.shape[0])
    # Re-parse our own output and check coefficients survive.
    jpg0 = reader.parse(jb)
    jpg1 = reader.parse(out)
    for c0, c1 in zip(jpg0.components, jpg1.components):
        assert np.array_equal(c0.coeffs, c1.coeffs)
