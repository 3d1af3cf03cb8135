"""Real-photo corpus contract on the TPU (VERDICT r3 missing item 5).

Encodes every photograph from tools/photo_corpus.py at q95 in ONE
batch-mode call (the deployment shape), then checks the
tests/test_corpus.py contract per image with the reference C++ oracle:

  - oracle butteraugli distance <= quality target (or the reference's
    achieved distance when the target is infeasible, same fallback as
    test_corpus.py:106-113)
  - output size <= reference encoder's size * 1.02 (+64 B allowance)

Writes benchmarks/PHOTOS.json and exits nonzero on any contract
failure. Reference bar: tests/golden_test.sh:7-21 (30 real PNGs).

Run inside a healthy TPU window; the mosaic bucket shares the mpix1
bench bucket so bench_configs warm-up covers it.
"""

import json
import pathlib
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))
sys.path.insert(0, str(REPO))
ORACLE = REPO / "tools" / "ref_oracle" / "build" / "oracle"
Q95_TARGET = 0.9718234


def oracle_distance(rgb0, rgb1):
    h, w = rgb0.shape[:2]
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        rgb0.astype(np.uint8).tofile(td / "a.rgb")
        rgb1.astype(np.uint8).tofile(td / "b.rgb")
        r = subprocess.run(
            [str(ORACLE), "ba", str(w), str(h), str(td / "a.rgb"),
             str(td / "b.rgb")], capture_output=True, text=True,
            timeout=1800)
        return float(r.stdout.split("distance=")[1])


def oracle_encode(rgb, quality):
    h, w = rgb.shape[:2]
    from PIL import Image
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        rgb.astype(np.uint8).tofile(td / "in.rgb")
        r = subprocess.run(
            [str(ORACLE), "encode_rgb", str(w), str(h),
             str(td / "in.rgb"), str(quality), str(td / "out.jpg")],
            capture_output=True, text=True, timeout=7200)
        return (int(r.stdout.split("size=")[1]),
                np.asarray(Image.open(td / "out.jpg").convert("RGB")))


def main():
    assert ORACLE.exists(), "build tools/ref_oracle first"
    import io
    from PIL import Image
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from guetzli_tpu.parallel.batch_mode import process_batch
    from photo_corpus import photos

    corpus = photos()
    names = [n for n, _ in corpus]
    imgs = [rgb for _, rgb in corpus]
    t0 = time.time()
    outs = process_batch(imgs, quality=95)
    encode_s = round(time.time() - t0, 2)

    results = {"_meta": {"ts": time.time(), "encode_seconds": encode_s,
                         "device": str(jax.devices()[0]),
                         "images": names}}
    failures = []
    for name, rgb, out in zip(names, imgs, outs):
        if out is None:
            failures.append(f"{name}: encode failed")
            continue
        dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
        d = oracle_distance(rgb, dec)
        ref_size, ref_dec = oracle_encode(rgb, 95)
        rec = {"mpix": round(rgb.shape[0] * rgb.shape[1] / 1e6, 3),
               "bytes": len(out), "reference_bytes": ref_size,
               "size_ratio": round(len(out) / ref_size, 4),
               "oracle_distance": d, "target": Q95_TARGET}
        bound = Q95_TARGET
        if d > bound * 1.0005:
            rec["ref_distance"] = oracle_distance(rgb, ref_dec)
            bound = max(bound, rec["ref_distance"])
        rec["quality_ok"] = bool(d <= bound * 1.0005)
        rec["size_ok"] = bool(
            len(out) <= max(ref_size * 1.02, ref_size + 64))
        if not rec["quality_ok"]:
            failures.append(f"{name}: distance {d:.4f} > {bound:.4f}")
        if not rec["size_ok"]:
            failures.append(
                f"{name}: size {len(out)} > ref {ref_size} * 1.02")
        results[name] = rec
        print(name, json.dumps(rec), flush=True)

    results["_meta"]["failures"] = failures
    out_path = REPO / "benchmarks" / "PHOTOS.json"
    out_path.write_text(json.dumps(results, indent=1))
    print(f"wrote {out_path}; {len(failures)} failures", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
