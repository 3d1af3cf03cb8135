"""Params surface paths: try_420 / force_420 / silver screen / grayscale.

These mirror the reference's internal `Params` knobs
(guetzli/processor.h:29-37) that the CLI never exposed; each path must
produce a valid sequential JPEG meeting the distance contract.
"""

import io

import numpy as np
import pytest
from PIL import Image

from tests.conftest import ORACLE
from tests.test_e2e import Q95_TARGET, _decode, _oracle_distance


def _run(crop, **param_overrides):
    from guetzli_tpu.config import Params, ProcessStats
    from guetzli_tpu.search.processor import process_rgb
    from guetzli_tpu.search.quality import butteraugli_score_for_quality

    p = Params(**param_overrides)
    p.butteraugli_target = butteraugli_score_for_quality(95)
    return process_rgb(p, ProcessStats(), crop)


@pytest.fixture(scope="module")
def crop(bees_rgb):
    return np.ascontiguousarray(bees_rgb[:64, 100:164])


def test_force_420(oracle, crop, tmp_path):
    out = _run(crop, force_420=True)
    from guetzli_tpu.jpeg import reader
    jpg = reader.parse(out)
    assert jpg.is_420()
    d = _oracle_distance(oracle, crop, _decode(out), tmp_path)
    assert d <= Q95_TARGET * 1.0005, d


def test_try_420_picks_better(oracle, crop, tmp_path):
    out_444 = _run(crop)
    out_try = _run(crop, try_420=True)
    # try_420 evaluates both sampling modes and keeps the better-scoring
    # output — never worse than 444-only.
    assert len(out_try) <= len(out_444)
    d = _oracle_distance(oracle, crop, _decode(out_try), tmp_path)
    assert d <= Q95_TARGET * 1.0005, d


def test_force_420_silver_screen(oracle, crop, tmp_path):
    out = _run(crop, force_420=True, use_silver_screen=True)
    from guetzli_tpu.jpeg import reader
    assert reader.parse(out).is_420()
    d = _oracle_distance(oracle, crop, _decode(out), tmp_path)
    assert d <= Q95_TARGET * 1.0005, d


def test_grayscale_png(oracle, bees_rgb, tmp_path):
    gray = np.asarray(
        Image.fromarray(bees_rgb[:64, :64]).convert("L").convert("RGB"))
    out = _run(np.ascontiguousarray(gray))
    dec = _decode(out)
    d = _oracle_distance(oracle, gray, dec, tmp_path)
    assert d <= Q95_TARGET * 1.0005, d
    # grayscale input -> single-component scan (zero chroma dropped by
    # SaveToJpegData, reference output_image.cc:351-356)
    from guetzli_tpu.jpeg import reader
    jpg = reader.parse(out)
    assert len(jpg.components) == 1
