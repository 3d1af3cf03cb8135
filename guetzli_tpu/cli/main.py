"""guetzli-compatible command line.

Reference: guetzli/guetzli.cc:232-326. Same flags and I/O conventions
(`-`/`--` stdin/stdout, PNG magic sniff, alpha blended on black, memory
estimate gate) plus a batch extension: if the input is a directory every
PNG/JPEG inside is encoded data-parallel.
"""

from __future__ import annotations

import argparse
import io
import os
import sys

import numpy as np


def _read_png(data: bytes) -> np.ndarray:
    from PIL import Image
    im = Image.open(io.BytesIO(data))
    im.load()
    if im.mode in ("RGBA", "LA", "PA"):
        # Blend alpha on black (reference guetzli.cc:43-45,135-147).
        im = im.convert("RGBA")
        arr = np.asarray(im).astype(np.uint16)
        rgb = (arr[..., :3] * arr[..., 3:4] // 255).astype(np.uint8)
        return rgb
    return np.asarray(im.convert("RGB"))


def _encode_one(data: bytes, args) -> bytes:
    from guetzli_tpu.config import Params, ProcessStats
    from guetzli_tpu.search.processor import (process_jpeg_bytes,
                                              process_rgb)
    from guetzli_tpu.search.quality import butteraugli_score_for_quality

    params = Params(
        butteraugli_target=butteraugli_score_for_quality(args.quality),
        try_420=getattr(args, "try_420", False),
        force_420=getattr(args, "force_420", False),
        use_silver_screen=getattr(args, "use_silver_screen", False),
        distance_margin=getattr(args, "distance_margin", 0.998))
    stats = ProcessStats()
    if args.verbose:
        # reference wiring: debug sink = stderr (guetzli.cc:279-281)
        stats.debug_output_file = sys.stderr

    if data[:8] == b"\x89PNG\r\n\x1a\n":
        rgb = _read_png(data)
        h, w = rgb.shape[:2]
        _check_memlimit(args, w, h)
        return process_rgb(params, stats, rgb)
    _check_memlimit_jpeg(args, data)
    return process_jpeg_bytes(params, stats, data)


def _check_memlimit(args, w, h):
    # Reference gate: 350 bytes/pixel estimate, floor 100 MB
    # (guetzli.cc:38-39,294-300).
    if args.nomemlimit:
        return
    mb = max(350 * w * h / (1 << 20), 100)
    if mb > args.memlimit:
        sys.stderr.write("Memory limit would be exceeded. Failing.\n")
        sys.exit(1)


def _check_memlimit_jpeg(args, data):
    from guetzli_tpu.jpeg import reader
    try:
        jpg = reader.parse(data, reader.ReadMode.HEADER)
    except Exception:
        sys.stderr.write("Can't read jpg data from input file\n")
        sys.exit(1)
    _check_memlimit(args, jpg.width, jpg.height)


def _enable_compile_cache():
    """Persistent XLA compile cache: first-ever run pays the ~minutes-long
    pipeline compile once; every later CLI invocation loads it in seconds.
    Opt out with GUETZLI_TPU_NO_CACHE=1; override dir with
    GUETZLI_TPU_CACHE_DIR."""
    if os.environ.get("GUETZLI_TPU_NO_CACHE"):
        return
    import jax
    cache = os.environ.get(
        "GUETZLI_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "guetzli_tpu",
                     "xla"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="guetzli-tpu",
        description="Perceptual JPEG encoder (TPU-native guetzli)")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--quality", type=float, default=95)
    p.add_argument("--memlimit", type=int, default=6000,
                   help="memory limit in MB")
    p.add_argument("--nomemlimit", action="store_true")
    # Extensions: the reference keeps these in Params without CLI flags
    # (guetzli/processor.h:29-37).
    p.add_argument("--try-420", action="store_true", dest="try_420",
                   help="also evaluate 4:2:0 chroma subsampling")
    p.add_argument("--force-420", action="store_true", dest="force_420",
                   help="always encode 4:2:0")
    p.add_argument("--silver-screen", action="store_true",
                   dest="use_silver_screen",
                   help="gamma-aware iterative chroma downsampling")
    p.add_argument("--distance-margin", type=float, default=0.998,
                   dest="distance_margin", metavar="M",
                   help="multiply the butteraugli target by M (default "
                        "0.998: headroom so the f64-measured distance "
                        "stays at/under the nominal target despite the "
                        "f32 device metric; 1.0 = reference-identical "
                        "acceptance arithmetic; see PARITY.md)")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="capture a jax profiler trace into DIR")
    p.add_argument("input", help="input PNG/JPEG, '-' for stdin, or a "
                   "directory for batch mode")
    p.add_argument("output", help="output JPEG, '-' for stdout, or a "
                   "directory in batch mode")
    args = p.parse_args(argv)
    _enable_compile_cache()

    if args.quality < 84:
        sys.stderr.write(
            "Guetzli should be called with quality >= 84, otherwise the\n"
            "output will have noticeable artifacts.\n")
        return 1

    if args.profile:
        import jax
        jax.profiler.start_trace(args.profile)
    try:
        return _run_cli(args)
    finally:
        if args.profile:
            import jax
            jax.profiler.stop_trace()


def _run_cli(args) -> int:
    if os.path.isdir(args.input):
        # Batch mode: all images encode concurrently on the chip via the
        # cross-image device-call batcher (per-image failures isolated).
        # Finished outputs are written immediately (checkpointing): a
        # re-run skips files that already exist in the output directory.
        from guetzli_tpu.parallel.batch_mode import process_batch

        os.makedirs(args.output, exist_ok=True)
        names = sorted(n for n in os.listdir(args.input)
                       if n.lower().endswith((".png", ".jpg", ".jpeg")))
        out_paths = [os.path.join(args.output,
                                  os.path.splitext(n)[0] + ".jpg")
                     for n in names]
        todo = [i for i, p in enumerate(out_paths)
                if not os.path.exists(p)]
        skipped = len(names) - len(todo)
        if skipped and args.verbose:
            sys.stderr.write(f"resuming: {skipped} already done\n")
        inputs = []
        for i in todo:
            data = open(os.path.join(args.input, names[i]), "rb").read()
            if data[:8] == b"\x89PNG\r\n\x1a\n":
                inputs.append(_read_png(data))
            else:
                inputs.append(data)

        def write_done(j, out):
            if out is not None:
                open(out_paths[todo[j]], "wb").write(out)

        from guetzli_tpu.config import Params
        bparams = Params(try_420=getattr(args, "try_420", False),
                         force_420=getattr(args, "force_420", False),
                         use_silver_screen=getattr(args,
                                                   "use_silver_screen",
                                                   False),
                         distance_margin=getattr(args, "distance_margin",
                                                 0.998))
        outs = process_batch(inputs, quality=args.quality, params=bparams,
                             on_complete=write_done)
        failures = 0
        for j, out in enumerate(outs):
            if out is None:
                sys.stderr.write(f"{names[todo[j]]}: FAILED\n")
                failures += 1
        return 1 if failures else 0

    data = (sys.stdin.buffer.read() if args.input in ("-", "--")
            else open(args.input, "rb").read())
    try:
        out = _encode_one(data, args)
    except Exception as e:
        sys.stderr.write(f"error: {e}\n")
        return 1
    if args.output in ("-", "--"):
        sys.stdout.buffer.write(out)
    else:
        open(args.output, "wb").write(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
