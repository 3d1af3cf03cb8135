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


def _heatmap(diffmap: np.ndarray, good: float, bad: float) -> np.ndarray:
    """Blue->yellow->red heatmap like the reference CLI's PNM output."""
    v = np.clip((diffmap - good) / max(bad - good, 1e-9), 0.0, 2.0)
    r = np.clip(v, 0, 1)
    g = np.clip(v - 1.0, 0, 1)
    b = np.clip(1.0 - v, 0, 1)
    return (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)


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
        from PIL import Image
        good, bad = 0.5, 2.0
        Image.fromarray(_heatmap(dmap, good, bad)).save(args.heatmap)
    return 0


if __name__ == "__main__":
    sys.exit(main())
