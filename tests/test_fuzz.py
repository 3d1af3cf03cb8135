"""Parser/process robustness fuzzing (reference fuzz_target.cc:6-25).

The reference fuzzes the full Process() on arbitrary bytes <= 10 kpix via
libFuzzer; here a seeded corpus of random bytes, truncations, and bit
flips of valid JPEGs must either succeed or raise a controlled error —
never crash, hang, or corrupt state.
"""

import io

import numpy as np
import pytest
from PIL import Image

from guetzli_tpu.jpeg import reader
from guetzli_tpu.jpeg.error import JpegDecodeError


CONTROLLED = (JpegDecodeError, ValueError)


@pytest.fixture(scope="module")
def valid_jpeg(bees_rgb):
    buf = io.BytesIO()
    Image.fromarray(bees_rgb[:64, :64]).save(buf, "JPEG", quality=100,
                                             subsampling=0)
    return buf.getvalue()


def test_random_bytes_never_crash():
    rng = np.random.default_rng(0)
    for _ in range(200):
        n = int(rng.integers(0, 2000))
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        try:
            reader.parse(data)
        except CONTROLLED:
            pass


def test_random_bytes_with_soi_prefix():
    rng = np.random.default_rng(1)
    for _ in range(200):
        n = int(rng.integers(2, 2000))
        data = b"\xff\xd8" + rng.integers(0, 256, n,
                                          dtype=np.uint8).tobytes()
        try:
            reader.parse(data)
        except CONTROLLED:
            pass


def test_truncations(valid_jpeg):
    for cut in range(0, len(valid_jpeg), max(1, len(valid_jpeg) // 97)):
        try:
            reader.parse(valid_jpeg[:cut])
        except CONTROLLED:
            pass


def test_bit_flips(valid_jpeg):
    rng = np.random.default_rng(2)
    base = np.frombuffer(valid_jpeg, dtype=np.uint8)
    for _ in range(150):
        data = base.copy()
        for _ in range(int(rng.integers(1, 5))):
            pos = int(rng.integers(0, len(data)))
            data[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            jpg = reader.parse(data.tobytes())
            # if it parsed, basic invariants must hold
            assert 0 < jpg.width <= 1 << 16
            assert 0 < jpg.height <= 1 << 16
        except CONTROLLED:
            pass


def test_process_on_mutated_small_jpegs(valid_jpeg):
    """Full Process() on slightly-corrupted small inputs (<=10 kpix like
    the reference fuzz target): success or controlled failure."""
    import guetzli_tpu
    from guetzli_tpu.config import ProcessStats

    rng = np.random.default_rng(3)
    base = np.frombuffer(valid_jpeg, dtype=np.uint8)
    ran = 0
    for _ in range(6):
        data = base.copy()
        pos = int(rng.integers(0, len(data)))
        data[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            out = guetzli_tpu.process(data.tobytes(), quality=95,
                                      stats=ProcessStats())
            assert out[:2] == b"\xff\xd8"
            ran += 1
        except CONTROLLED:
            pass
    # at least the unmutated input must encode
    out = guetzli_tpu.process(valid_jpeg, quality=95, stats=ProcessStats())
    assert out[:2] == b"\xff\xd8" and out[-2:] == b"\xff\xd9"
