"""Golden-harness tests (reference tests/golden_test.sh semantics).

The reference encodes a PNG corpus plus cjpeg 444/420/progressive
variants and sha256-checks outputs; notably sequential and progressive
encodings of the same image must produce BYTE-IDENTICAL output
(golden_checksums.txt:2,4), and repeated runs must be deterministic.
Those two hard contracts carry over unchanged; absolute byte-identity
with the C++ binary is replaced by the oracle-measured distance/size
contract in test_e2e.py (f32 device metric vs doubles).
"""

import io

import numpy as np
import pytest
from PIL import Image


def _encode(data_or_rgb):
    import guetzli_tpu
    from guetzli_tpu.config import ProcessStats
    return guetzli_tpu.process(data_or_rgb, quality=95,
                               stats=ProcessStats())


@pytest.fixture(scope="module")
def crop(bees_rgb):
    return np.ascontiguousarray(bees_rgb[32:96, 48:128])


def _jpeg_bytes(rgb, **save_kwargs):
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "JPEG", quality=100, **save_kwargs)
    return buf.getvalue()


def test_deterministic_across_runs(crop):
    a = _encode(crop)
    b = _encode(crop)
    assert a == b


def test_sequential_and_progressive_inputs_byte_identical(crop):
    """A sequential and a progressive encoding of the same q100 444 JPEG
    decode to identical coefficients, so the optimizer must emit
    byte-identical output for both (the reference's golden contract)."""
    seq = _jpeg_bytes(crop, subsampling=0)
    prog = _jpeg_bytes(crop, subsampling=0, progressive=True)
    # sanity: inputs really differ but decode identically
    assert seq != prog
    from guetzli_tpu.jpeg import reader
    js, jp = reader.parse(seq), reader.parse(prog)
    for cs, cp in zip(js.components, jp.components):
        np.testing.assert_array_equal(cs.coeffs, cp.coeffs)

    out_seq = _encode(seq)
    out_prog = _encode(prog)
    assert out_seq == out_prog


def test_420_input_stays_420_and_deterministic(crop):
    j420 = _jpeg_bytes(crop, subsampling=2)
    a = _encode(j420)
    b = _encode(j420)
    assert a == b
    from guetzli_tpu.jpeg import reader
    assert reader.parse(a).is_420()
