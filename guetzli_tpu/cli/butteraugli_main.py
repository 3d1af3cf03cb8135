"""Stand-alone butteraugli distance tool.

Equivalent of the vendored butteraugli CLI
(third_party/butteraugli/butteraugli/butteraugli_main.cc): two images in,
distance on stdout, optional PNM heatmap.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _load_rgb(path: str) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"))


# Fuzzy-class mapping (reference butteraugli.cc:1903-1932): a sigmoid
# "quality class" in [0, 2], 1.0-centred at score 1.0, with different
# widths above/below; the heatmap thresholds are its inverse at class
# 1.5 (good) and 0.5 (bad), as in butteraugli_main.cc:423-424.
_FUZZY_WIDTH_UP = 6.07887388532
_FUZZY_WIDTH_DOWN = 5.50793514384
_FUZZY_SCALER = 0.840253347958


def fuzzy_class(score: np.ndarray) -> np.ndarray:
    score = np.asarray(score, dtype=np.float64)
    lo = 2.0 / (1.0 + np.exp((score - 1.0) * _FUZZY_WIDTH_DOWN))
    lo = (lo - 1.0) * (2.0 - _FUZZY_SCALER) + _FUZZY_SCALER
    hi = 2.0 / (1.0 + np.exp((score - 1.0) * _FUZZY_WIDTH_UP))
    hi = hi * _FUZZY_SCALER
    return np.where(score < 1.0, lo, hi)


def fuzzy_inverse(seek: float) -> float:
    """Bisection inverse of fuzzy_class (butteraugli.cc:1923-1932)."""
    pos = 0.0
    r = 1.0
    while r >= 1e-10:
        pos += -r if fuzzy_class(pos) < seek else r
        r *= 0.5
    return pos


# 12-stop colour table of ScoreToRgb (butteraugli.cc:1936-1974); the
# piecewise score normalization maps [0, good] -> [0, 0.3],
# [good, bad] -> [0.3, 0.45], beyond -> [0.45, 0.95].
_HEAT_STOPS = np.array([
    [0, 0, 0], [0, 0, 1], [0, 1, 1], [0, 1, 0], [1, 1, 0], [1, 0, 0],
    [1, 0, 1], [0.5, 0.5, 1.0], [1.0, 0.5, 0.5], [1.0, 1.0, 0.5],
    [1, 1, 1], [1, 1, 1]], dtype=np.float64)


def _heatmap(diffmap: np.ndarray, good: float, bad: float) -> np.ndarray:
    """Reference heatmap: fuzzy thresholds + 12-stop table with sqrt
    gamma (butteraugli.cc:1936-1992)."""
    d = np.asarray(diffmap, dtype=np.float64)
    s = np.where(
        d < good, (d / good) * 0.3,
        np.where(d < bad, 0.3 + (d - good) / (bad - good) * 0.15,
                 0.45 + (d - bad) / (bad * 12) * 0.5))
    n = len(_HEAT_STOPS)
    s = np.clip(s * (n - 1), 0.0, n - 2)
    ix = s.astype(np.int64)
    mix = (s - ix)[..., None]
    v = mix * _HEAT_STOPS[ix + 1] + (1.0 - mix) * _HEAT_STOPS[ix]
    return (255.0 * np.sqrt(v) + 0.5).astype(np.uint8)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="butteraugli-tpu")
    p.add_argument("image1")
    p.add_argument("image2")
    p.add_argument("heatmap", nargs="?", default=None,
                   help="optional output heatmap PNG/PNM path")
    args = p.parse_args(argv)

    from guetzli_tpu.metric.diffmap import butteraugli_diffmap
    from guetzli_tpu.ops.gamma import SRGB8_TO_LINEAR

    rgb0 = _load_rgb(args.image1)
    rgb1 = _load_rgb(args.image2)
    if rgb0.shape != rgb1.shape:
        sys.stderr.write("image dimensions differ\n")
        return 1
    lin0 = SRGB8_TO_LINEAR[rgb0].transpose(2, 0, 1).astype(np.float32)
    lin1 = SRGB8_TO_LINEAR[rgb1].transpose(2, 0, 1).astype(np.float32)
    dmap = np.asarray(butteraugli_diffmap(lin0, lin1))
    print(f"{dmap.max():.6f}")
    if args.heatmap:
        good = fuzzy_inverse(1.5)
        bad = fuzzy_inverse(0.5)
        rgb = _heatmap(dmap, good, bad)
        if args.heatmap.endswith((".ppm", ".pnm")):
            with open(args.heatmap, "wb") as f:   # P6, like the reference
                f.write(b"P6\n%d %d\n255\n"
                        % (rgb.shape[1], rgb.shape[0]))
                f.write(rgb.tobytes())
        else:
            from PIL import Image
            Image.fromarray(rgb).save(args.heatmap)
    return 0


if __name__ == "__main__":
    sys.exit(main())
