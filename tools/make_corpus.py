"""Deterministic synthetic test corpus.

The reference's golden harness downloads a 30-PNG corpus
(/root/reference/tests/golden_test.sh:1-31); this environment has no
network, so the corpus-scale contract is checked against a generated set
of varied images instead: gradients, plasma (octave noise), hard edges,
text-like glyphs, saturated patches, high-frequency noise, and crops of
the checked-in photo. Same seed -> identical corpus everywhere.
"""

from __future__ import annotations

import numpy as np


def _plasma(rng, h, w, octaves=4):
    acc = np.zeros((h, w, 3))
    for o in range(octaves):
        s = 2 ** o
        small = rng.random((-(-h // (4 * s)) + 1, -(-w // (4 * s)) + 1, 3))
        # bilinear-ish upscale via repeat + box smoothing
        up = np.kron(small, np.ones((4 * s, 4 * s, 1)))[:h, :w]
        k = 2 * s + 1
        c = np.cumsum(np.cumsum(np.pad(up, ((k, k), (k, k), (0, 0)),
                                       mode="edge"), 0), 1)
        box = (c[2 * k:, 2 * k:] - c[:-2 * k, 2 * k:]
               - c[2 * k:, :-2 * k] + c[:-2 * k, :-2 * k])
        box = box[:h, :w] / (2 * k) ** 2
        acc += box / (o + 1)
    acc -= acc.min()
    return (acc / max(acc.max(), 1e-9) * 255).astype(np.uint8)


def _gradient(rng, h, w):
    y, x = np.mgrid[0:h, 0:w]
    c0 = rng.integers(0, 256, 3)
    c1 = rng.integers(0, 256, 3)
    t = ((x / max(w - 1, 1)) * 0.6 + (y / max(h - 1, 1)) * 0.4)[..., None]
    return (c0 * (1 - t) + c1 * t).astype(np.uint8)


def _edges(rng, h, w):
    img = np.full((h, w, 3), 240, np.uint8)
    for _ in range(12):
        y0, x0 = rng.integers(0, h), rng.integers(0, w)
        hh, ww = rng.integers(4, h // 2 + 4), rng.integers(4, w // 2 + 4)
        col = rng.integers(0, 256, 3)
        img[y0:y0 + hh, x0:x0 + ww] = col
    return img


def _glyphs(rng, h, w):
    img = np.full((h, w, 3), 255, np.uint8)
    for _ in range(60):
        y0, x0 = rng.integers(0, max(h - 6, 1)), rng.integers(
            0, max(w - 6, 1))
        gw = rng.integers(1, 3)
        if rng.random() < 0.5:
            img[y0:y0 + 6, x0:x0 + gw] = 10
        else:
            img[y0:y0 + gw, x0:x0 + 6] = 10
    return img


def _noise(rng, h, w):
    return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)


def _saturated(rng, h, w):
    img = _plasma(rng, h, w, 3).astype(np.float64)
    mean = img.mean(axis=2, keepdims=True)
    img = np.clip(mean + (img - mean) * 3.0, 0, 255)
    return img.astype(np.uint8)


def _photo_crop(rng, h, w, photo):
    ph, pw = photo.shape[:2]
    y0 = int(rng.integers(0, max(ph - h, 1)))
    x0 = int(rng.integers(0, max(pw - w, 1)))
    crop = photo[y0:y0 + h, x0:x0 + w]
    out = np.zeros((h, w, 3), np.uint8)
    out[:crop.shape[0], :crop.shape[1]] = crop
    return out


KINDS = [_plasma, _gradient, _edges, _glyphs, _noise, _saturated,
         _photo_crop]

# (kind index, height, width) — odd sizes included deliberately
SPECS = [
    (0, 64, 64), (0, 96, 80), (1, 64, 96), (1, 80, 80), (2, 72, 88),
    (2, 64, 64), (3, 80, 96), (3, 64, 72), (4, 64, 64), (5, 96, 96),
    (5, 64, 80), (6, 96, 96), (6, 80, 64), (0, 67, 93), (2, 95, 63),
    (6, 73, 89), (1, 33, 49), (3, 97, 65), (5, 81, 47), (4, 65, 33),
]


def build_corpus(photo: np.ndarray):
    """Returns [(name, rgb uint8 (h, w, 3))], deterministic."""
    out = []
    for i, (kind, h, w) in enumerate(SPECS):
        rng = np.random.default_rng(1000 + i)
        fn = KINDS[kind]
        rgb = (fn(rng, h, w, photo) if fn is _photo_crop
               else fn(rng, h, w))
        out.append((f"c{i:02d}_{fn.__name__.lstrip('_')}_{h}x{w}", rgb))
    return out


if __name__ == "__main__":
    import pathlib
    import sys
    from PIL import Image
    dst = pathlib.Path(sys.argv[1] if len(sys.argv) > 1
                       else "tests/data/corpus")
    dst.mkdir(parents=True, exist_ok=True)
    photo = np.asarray(Image.open(
        pathlib.Path(__file__).resolve().parent.parent / "tests" / "data"
        / "bees.png").convert("RGB"))
    for name, rgb in build_corpus(photo):
        Image.fromarray(rgb).save(dst / f"{name}.png")
    print(f"wrote {len(SPECS)} images to {dst}")
