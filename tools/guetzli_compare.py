#!/usr/bin/env python3
"""Size-at-matched-butteraugli-distance comparison harness.

Protocol from the reference's tools/guetzli-compare.py:23-41: for each
input PNG, encode with a rival encoder (default: PIL/libjpeg at a given
quality), measure the rival's butteraugli distance to the original, then
bisect guetzli-tpu's --quality (84..110, +-0.05) until its distance is
strictly better, and report both file sizes. The headline claim is the
size saving at matched-or-better perceptual distance.

Usage:
    python tools/guetzli_compare.py image.png [--rival-quality 95]
"""

from __future__ import annotations

import argparse
import io
import sys

import numpy as np


import pathlib

_ORACLE = (pathlib.Path(__file__).resolve().parent / "ref_oracle"
           / "build" / "oracle")


def _distance(rgb0: np.ndarray, rgb1: np.ndarray) -> float:
    """Butteraugli distance judged by an INDEPENDENT metric: the reference
    C++ butteraugli (the oracle binary), as in the reference protocol
    (tools/guetzli-compare.py:23-41) where the judge is never the encoder
    under test. Falls back to our own metric (with a warning) only when
    the oracle isn't built."""
    if _ORACLE.exists():
        import subprocess
        import tempfile
        h, w = rgb0.shape[:2]
        with tempfile.TemporaryDirectory() as td:
            p0, p1 = pathlib.Path(td) / "a.rgb", pathlib.Path(td) / "b.rgb"
            rgb0.astype(np.uint8).tofile(p0)
            rgb1.astype(np.uint8).tofile(p1)
            r = subprocess.run(
                [str(_ORACLE), "ba", str(w), str(h), str(p0), str(p1)],
                capture_output=True, text=True, timeout=600)
            return float(r.stdout.split("distance=")[1])
    print("warning: oracle not built (tools/ref_oracle/build.sh); "
          "judging with the encoder's own metric", file=sys.stderr)
    import jax.numpy as jnp
    from guetzli_tpu.metric.diffmap import butteraugli_distance
    from guetzli_tpu.ops.gamma import srgb8_to_linear_fast

    lin0 = srgb8_to_linear_fast(jnp.asarray(rgb0.transpose(2, 0, 1)))
    lin1 = srgb8_to_linear_fast(jnp.asarray(rgb1.transpose(2, 0, 1)))
    return float(butteraugli_distance(lin0, lin1))


def _decode(data: bytes) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("image", help="input PNG")
    p.add_argument("--rival-quality", type=int, default=95,
                   help="libjpeg quality for the rival encoding")
    p.add_argument("--qmin", type=float, default=84.0)
    p.add_argument("--qmax", type=float, default=110.0)
    p.add_argument("--tol", type=float, default=0.05)
    args = p.parse_args(argv)

    from PIL import Image
    import guetzli_tpu
    from guetzli_tpu.config import ProcessStats

    rgb = np.asarray(Image.open(args.image).convert("RGB"))

    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "JPEG", quality=args.rival_quality)
    rival = buf.getvalue()
    rival_dist = _distance(rgb, _decode(rival))
    print(f"rival (libjpeg q{args.rival_quality}): {len(rival)} bytes, "
          f"butteraugli {rival_dist:.4f}", flush=True)

    # Bisect quality until guetzli-tpu's distance beats the rival's.
    lo, hi = args.qmin, args.qmax
    best = None
    while hi - lo > args.tol:
        q = (lo + hi) / 2
        out = guetzli_tpu.process(rgb, quality=q, stats=ProcessStats())
        d = _distance(rgb, _decode(out))
        print(f"  q={q:.2f}: {len(out)} bytes, distance {d:.4f}",
              flush=True)
        if d < rival_dist:
            best = (q, out, d)
            hi = q
        else:
            lo = q
    if best is None:
        print("guetzli-tpu could not beat the rival's distance in range")
        return 1
    q, out, d = best
    saving = 100.0 * (1 - len(out) / len(rival))
    print(f"guetzli-tpu q={q:.2f}: {len(out)} bytes @ distance {d:.4f} "
          f"(< {rival_dist:.4f})")
    print(f"size saving at matched-or-better distance: {saving:.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
