"""Helpers to call the reference-oracle binary for golden comparisons."""

import pathlib
import subprocess
import tempfile

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
ORACLE = str(REPO / "tools" / "ref_oracle" / "build" / "oracle")


def run(args):
    out = subprocess.run([ORACLE] + [str(a) for a in args],
                         capture_output=True, text=True)
    if out.returncode != 0:
        raise RuntimeError(f"oracle failed: {out.stderr}\n{out.stdout}")
    return out.stdout


def decode_jpg(jpeg_bytes: bytes):
    """Reference parse: returns (meta dict, list of per-component (n,64)
    int16 coeff arrays)."""
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        (td / "in.jpg").write_bytes(jpeg_bytes)
        run(["decode_jpg", td / "in.jpg", td / "meta.txt", td / "coef.i16"])
        meta_lines = (td / "meta.txt").read_text().strip().split("\n")
        raw = np.fromfile(td / "coef.i16", dtype=np.int16)
    meta = {"comps": [], "quant": []}
    for line in meta_lines:
        parts = line.split()
        if line.startswith("width="):
            for p in parts:
                k, v = p.split("=")
                meta[k] = int(v)
        elif line.startswith("comp "):
            meta["comps"].append(
                {k: int(v) for k, v in (p.split("=") for p in parts[1:])})
        elif line.startswith("quant "):
            vals = line.split(":")[1].split()
            meta["quant"].append(np.array([int(v) for v in vals]))
    coeffs = []
    off = 0
    for c in meta["comps"]:
        n = c["ncoeff"]
        coeffs.append(raw[off:off + n].reshape(-1, 64))
        off += n
    return meta, coeffs


def decode_rgb(jpeg_bytes: bytes):
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        (td / "in.jpg").write_bytes(jpeg_bytes)
        out = run(["decode_rgb", td / "in.jpg", td / "out.raw"])
        dims = dict(p.split("=") for p in out.split())
        w, h = int(dims["width"]), int(dims["height"])
        rgb = np.fromfile(td / "out.raw", dtype=np.uint8).reshape(h, w, 3)
    return rgb


def butteraugli(rgb0: np.ndarray, rgb1: np.ndarray) -> float:
    h, w, _ = rgb0.shape
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        rgb0.astype(np.uint8).tofile(td / "a.raw")
        rgb1.astype(np.uint8).tofile(td / "b.raw")
        out = run(["ba", w, h, td / "a.raw", td / "b.raw"])
    return float(out.split("=")[1])


def butteraugli_diffmap(rgb0: np.ndarray, rgb1: np.ndarray):
    h, w, _ = rgb0.shape
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        rgb0.astype(np.uint8).tofile(td / "a.raw")
        rgb1.astype(np.uint8).tofile(td / "b.raw")
        out = run(["diffmap", w, h, td / "a.raw", td / "b.raw", td / "d.f32"])
        dist = float(out.split("=")[1])
        dmap = np.fromfile(td / "d.f32", dtype=np.float32).reshape(h, w)
    return dist, dmap


def fdct_blocks(blocks_i16: np.ndarray) -> np.ndarray:
    n = blocks_i16.shape[0]
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        blocks_i16.astype(np.int16).tofile(td / "in.i16")
        run(["fdct", td / "in.i16", n, td / "out.i16"])
        return np.fromfile(td / "out.i16", dtype=np.int16).reshape(n, 64)


def idct_blocks(blocks_i16: np.ndarray) -> np.ndarray:
    n = blocks_i16.shape[0]
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        blocks_i16.astype(np.int16).tofile(td / "in.i16")
        run(["idct", td / "in.i16", n, td / "out.u8"])
        return np.fromfile(td / "out.u8", dtype=np.uint8).reshape(n, 64)


def opsin(rgb: np.ndarray) -> np.ndarray:
    h, w, _ = rgb.shape
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        rgb.astype(np.uint8).tofile(td / "in.raw")
        run(["opsin", w, h, td / "in.raw", td / "out.f32"])
        return np.fromfile(td / "out.f32", dtype=np.float32).reshape(3, h, w)


def blur(plane: np.ndarray, sigma: float, border_ratio: float) -> np.ndarray:
    h, w = plane.shape
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        plane.astype(np.float32).tofile(td / "in.f32")
        run(["blur", w, h, td / "in.f32", sigma, border_ratio, td / "o.f32"])
        return np.fromfile(td / "o.f32", dtype=np.float32).reshape(h, w)


def mask(rgb0: np.ndarray, rgb1: np.ndarray) -> np.ndarray:
    h, w, _ = rgb0.shape
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        rgb0.astype(np.uint8).tofile(td / "a.raw")
        rgb1.astype(np.uint8).tofile(td / "b.raw")
        run(["mask", w, h, td / "a.raw", td / "b.raw", td / "m.f32"])
        return np.fromfile(td / "m.f32", dtype=np.float32).reshape(6, h, w)


def encode_jpg(jpeg_bytes: bytes, quality: float) -> bytes:
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        (td / "in.jpg").write_bytes(jpeg_bytes)
        run(["encode_jpg", td / "in.jpg", quality, td / "out.jpg"])
        return (td / "out.jpg").read_bytes()


def encode_rgb(rgb: np.ndarray, quality: float) -> bytes:
    h, w, _ = rgb.shape
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        rgb.astype(np.uint8).tofile(td / "in.raw")
        run(["encode_rgb", w, h, td / "in.raw", quality, td / "out.jpg"])
        return (td / "out.jpg").read_bytes()
