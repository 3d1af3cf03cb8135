"""Device image-state tests: decoded pixels must match the reference's
OutputImage path (integer IDCT + fancy upsample + dither + color transform)
bit-for-bit, and save_to_jpeg_data must round-trip."""

import io

import numpy as np
import pytest
from PIL import Image

import oracle_util
from guetzli_tpu.image.output_image import OutputImage
from guetzli_tpu.jpeg import reader, writer


def _make_jpeg(rgb, **kwargs):
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="JPEG", **kwargs)
    return buf.getvalue()


@pytest.mark.parametrize("subsampling,quality", [(0, 95), (2, 85), (2, 95)])
def test_to_srgb_matches_reference_decode(bees_rgb, subsampling, quality):
    jb = _make_jpeg(bees_rgb, quality=quality, subsampling=subsampling)
    ref_rgb = oracle_util.decode_rgb(jb)                 # (H, W, 3)
    jpg = reader.parse(jb)
    img = OutputImage(jpg.width, jpg.height)
    img.copy_from_jpeg_data(jpg)
    ours = np.asarray(img.to_srgb()).transpose(1, 2, 0)  # (H, W, 3)
    assert np.array_equal(ours.astype(np.uint8), ref_rgb)


def test_to_srgb_odd_sizes(rng):
    for (h, w) in [(17, 9), (23, 31), (34, 18)]:
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        jb = _make_jpeg(rgb, quality=90, subsampling=2)
        ref_rgb = oracle_util.decode_rgb(jb)
        jpg = reader.parse(jb)
        img = OutputImage(jpg.width, jpg.height)
        img.copy_from_jpeg_data(jpg)
        ours = np.asarray(img.to_srgb()).transpose(1, 2, 0)
        assert np.array_equal(ours.astype(np.uint8), ref_rgb)


@pytest.mark.parametrize("subsampling", [0, 2])
def test_save_roundtrip(bees_rgb, subsampling):
    """copy_from + save_to must match the reference's
    CopyFromJpegData+SaveToJpegData+WriteJpeg byte-for-byte (incl. the
    lossy DC-carry padding blocks of the 4:2:0 Y grid)."""
    import pathlib
    import tempfile

    jb = _make_jpeg(bees_rgb, quality=92, subsampling=subsampling)
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        (td / "in.jpg").write_bytes(jb)
        oracle_util.run(["roundtrip_outputimage", td / "in.jpg",
                         td / "out.jpg"])
        ref_bytes = (td / "out.jpg").read_bytes()
    jpg = reader.parse(jb)
    img = OutputImage(jpg.width, jpg.height)
    img.copy_from_jpeg_data(jpg)
    out_bytes = writer.serialize(img.save_to_jpeg_data())
    assert out_bytes == ref_bytes


def test_apply_global_quantization(bees_rgb):
    jb = _make_jpeg(bees_rgb, quality=95, subsampling=0)
    jpg = reader.parse(jb)
    img = OutputImage(jpg.width, jpg.height)
    img.copy_from_jpeg_data(jpg)
    q = np.stack([np.full(64, 7, np.int32), np.full(64, 9, np.int32),
                  np.full(64, 11, np.int32)])
    img.apply_global_quantization(q)
    for c, comp in enumerate(img.components):
        arr = np.asarray(comp.coeffs)
        assert np.all(arr % q[c][None, None, :] == 0)
    # save must now succeed with the new quant
    out = writer.serialize(img.save_to_jpeg_data())
    jpg2 = reader.parse(out)
    assert np.array_equal(jpg2.quant[0].values, q[0])
