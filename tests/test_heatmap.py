"""Heatmap parity: the fuzzy-class mapping and the 12-stop colour table
must be byte-identical to the reference's CreateHeatMapImage
(butteraugli.cc:1903-1992) on identical distmaps."""

import subprocess

import numpy as np

from guetzli_tpu.cli.butteraugli_main import (_heatmap, fuzzy_class,
                                              fuzzy_inverse)


def test_fuzzy_inverse_roundtrip():
    for seek in (0.25, 0.5, 1.0, 1.5, 1.9):
        pos = fuzzy_inverse(seek)
        assert abs(float(fuzzy_class(np.array([pos]))[0]) - seek) < 1e-8


def test_heatmap_bytes_match_oracle(oracle, rng, tmp_path):
    w, h = 37, 23
    dm = (rng.random((h, w)).astype(np.float32) * 3.0)
    (tmp_path / "dm.f32").write_bytes(dm.tobytes())
    r = subprocess.run(
        [oracle, "heatmap", str(w), str(h), str(tmp_path / "dm.f32"),
         str(tmp_path / "hm.rgb")], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    good, bad = [float(tok.split("=")[1]) for tok in r.stdout.split()]
    assert abs(good - fuzzy_inverse(1.5)) < 1e-9
    assert abs(bad - fuzzy_inverse(0.5)) < 1e-9
    ref = np.frombuffer((tmp_path / "hm.rgb").read_bytes(),
                        np.uint8).reshape(h, w, 3)
    ours = _heatmap(dm.astype(np.float64), good, bad)
    assert np.array_equal(ref, ours)
