"""Single-Pallas-program butteraugli diffmap (the metric mega-kernel).

The per-iteration fused compare is dispatch-overhead-bound on small
canvases: the XLA pipeline for opsin -> frequency cascade -> Malta/L2 ->
mask -> combine lowers to ~85 kernel launches, each a fixed ~0.1 ms on
the axon v5e regardless of how little data it touches. This kernel runs
the ENTIRE metric (everything between decoded linear RGB and the final
diffmap — reference butteraugli.cc:324-366, :489-622, :624-908,
:1638-1817) as ONE Pallas program.

Design notes:
- Blurs are the reference's truncated-Gaussian separable passes
  (butteraugli.cc:145-233) evaluated as unrolled shifted-adds on the
  VMEM-resident plane (W axis then H axis, matching ops/blur.py's
  matmul operand order), with the per-position border renormalization
  applied from precomputed (9, H)/(9, W) weight vectors — the same
  `_weights_dyn` values the XLA path uses, computed once outside.
- The Malta 16-direction stencils are static shifted-adds with
  zero-padded borders (same scheme as metric/malta_pallas.py, whole
  canvas per program).
- All pointwise math is IMPORTED from the jnp modules (opsin,
  frequencies, malta, mask) — the kernel body traces the same functions
  the XLA path runs, so parity is by construction up to f32 summation
  order inside the blurs. Zero-weighted channels of the reference's
  wmul table (ac-mf, ac0-hf asym, dc1 — exact zeros in both paths) are
  skipped.
- VMEM is bounded by VALUE liveness, not input residency: the big
  inputs (candidate linear RGB and the original's 10 PsychoImage
  planes) stay in HBM (`pltpu.ANY`) and each plane is DMA'd into a
  2-slot VMEM scratch at its use site, so peak usage is ~15 live planes
  regardless of how many inputs exist. This is what lets the bees
  bucket (480x304 = 146k px, 584 KB/plane) fit the 16 MB VMEM budget.
- Grid = (batch,): one program instance per image. The batched refine /
  batch-mode paths call it with B>1 so the whole group pays one launch.
"""

from __future__ import annotations

import functools
import hashlib
import json
import os
import pathlib
import threading

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from guetzli_tpu.metric import frequencies as fr
from guetzli_tpu.metric import malta as malta_mod
from guetzli_tpu.metric import mask as mask_mod
from guetzli_tpu.metric import opsin as opsin_mod
from guetzli_tpu.metric.frequencies import PsychoImage
from guetzli_tpu.ops import blur as blur_mod

# (sigma, border_ratio) of every blur in the metric, in pipeline order.
SIGMAS = (
    (1.2, 0.0),                                    # opsin dynamics
    (fr.SIGMA_LF, fr.BORDER_LF),                   # lf
    (fr.SIGMA_HF, fr.BORDER_MF),                   # mf
    (fr.SIGMA_UHF, fr.BORDER_HF),                  # uhf
    (10.6666499623, 0.0),                          # SameNoiseLevels
    (mask_mod.MASK_R2, mask_mod.MASK_BORDER_RATIO),
    (mask_mod.MASK_R0, mask_mod.MASK_BORDER_RATIO),
    (mask_mod.MASK_R1, mask_mod.MASK_BORDER_RATIO),
    (1.72547472444, 1.0),                          # CalculateDiffmap
)

# Single-program (mega) kernel ceiling, in PADDED-canvas pixels (the
# dims the kernel compiles at: H to sublane 8-multiples, W to lane
# 128-multiples — the bees bucket 304x480 pads to 304x512 = 155,648).
# Mosaic keeps ~100 (H, W) planes live across the cascade; under the
# raised 100 MB scoped-VMEM limit (see _VMEM_LIMIT) the padded bees
# bucket compiles and runs on v5e (measured 2026-08-19; under the
# default 16 MB limit it OOM'd at >= 160x256). Canvases above this
# ceiling dispatch to the stripe-tiled staged kernels
# (metric/fused_staged.py: same stage bodies, four pallas_calls with
# HBM handoffs, VMEM bounded by stripe slabs) up to _STAGED_MAX_PIXELS;
# beyond that, the XLA metric path. probe_fused degrades
# mega -> staged -> XLA per bucket on failure.
_FUSED_MAX_PIXELS = int(os.environ.get("GUETZLI_TPU_FUSED_MAX_PIXELS",
                                       160_000))
# Staged-path ceiling: VMEM is stripe-bounded, HBM holds ~30 planes
# (30 * 4 B/px = 120 B/px -> 2 GB at 16.7 MPix, fine for 16 GB v5e).
_STAGED_MAX_PIXELS = int(os.environ.get(
    "GUETZLI_TPU_STAGED_MAX_PIXELS", 1 << 24))
_ENV = os.environ.get("GUETZLI_TPU_FUSED_METRIC")

# Mosaic's default scoped-VMEM limit is 16 MB, but v5e physically has
# 128 MiB of VMEM — a 54 MB-live probe kernel compiles AND runs with a
# raised limit (measured 2026-08-19 on the axon v5e). The metric
# kernels' liveness (Mosaic keeps ~100 slab planes across the cascade)
# is what capped the mega kernel at 146k px under the default limit.
_VMEM_LIMIT = int(os.environ.get("GUETZLI_TPU_KERNEL_VMEM_LIMIT",
                                 100 * 1024 * 1024))


def compiler_params():
    """Shared Mosaic params for the metric kernels."""
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)

# Buckets whose probe_fused() compile/run failed: the XLA metric path is
# always available, so a VMEM overflow (or any backend Pallas defect)
# degrades THAT BUCKET to the slower path instead of killing the encode.
# Per-bucket (not process-wide) so one oversized bucket doesn't strip
# proven-good buckets of the fused path, and so every comparator of a
# given bucket makes the same fused/XLA choice (first probe decides
# permanently) — batch-mode determinism relies on that consistency.
_BROKEN_BUCKETS: set = set()

# Per-bucket mega/staged override: probe_fused flips a bucket whose
# mega-kernel compile failed to "staged" before giving up on the fused
# path entirely. Consulted at trace time; sticky once set (same
# determinism contract as _BROKEN_BUCKETS).
_BUCKET_PATH: dict = {}


def bucket_key(h: int, w: int) -> tuple:
    """Canonical per-bucket key: the PADDED canvas dims the kernels
    compile at (H to sublane 8-multiples, W to lane 128-multiples).
    Every probe result, broken-bucket mark, and mega/staged dispatch
    decision is keyed on this, so a degrade recorded by one caller is
    seen by all."""
    return (-(-h // 8) * 8, -(-w // 128) * 128)


def mark_bucket_broken(h: int, w: int) -> None:
    _BROKEN_BUCKETS.add(bucket_key(h, w))


def _bucket_path(H: int, W: int) -> str:
    key = bucket_key(H, W)
    return _BUCKET_PATH.get(
        key, "mega" if key[0] * key[1] <= _FUSED_MAX_PIXELS
        else "staged")


def fused_metric_eligible(canvas_h: int, canvas_w: int) -> bool:
    """Static (trace-time) gate: env override, else TPU + VMEM bound.
    Callers must additionally pass fused=False when the image is
    sp-sharded (a Pallas call cannot be GSPMD-partitioned)."""
    key = bucket_key(canvas_h, canvas_w)
    if _ENV == "0" or key in _BROKEN_BUCKETS:
        return False
    if key[0] * key[1] > _STAGED_MAX_PIXELS:
        return False
    if _ENV == "1":
        return True
    return jax.default_backend() == "tpu"


_PROBED_OK: set = set()
_PROBE_LOCKS: dict = {}
_PROBE_LOCKS_GUARD = threading.Lock()


def quant_search_nslots(canvas_h: int, canvas_w: int) -> int:
    """Speculative quant-search batch width for a canvas (shared with
    processor.select_quant_matrix so the probe covers the exact batch
    shape the search will emit — round 3 shipped a kernel whose B>1
    lowering crashed precisely because nothing probed this shape)."""
    return 8 if canvas_h * canvas_w / 1e6 <= 2.3 else 4


def _probe_batch_shapes(key, h: int, w: int) -> tuple:
    """Batch sizes the encoder can emit fused_diffmap_batch at, for this
    canvas bucket: B=1 (refine / single compares) plus the speculative
    quant search's slot count. nslots is computed from the TRUE image
    dims (what processor.select_quant_matrix uses) AND from the padded
    bucket key — for buckets straddling the 2.3 MPix threshold these
    differ, and the probe's outcome is cached per bucket, so both batch
    widths must be checked. The B=1 case is compiled AND run; the rest
    are LOWER-checked only — Mosaic's block-mapping validation (the
    round-3 B>1 failure class) runs during lowering, in seconds, while
    a full compile is minutes per shape. VMEM-fit failures at B>1 can
    escape lowering, but since compare_requant_batch catches execution-
    time failures at materialization and degrades to the XLA path
    (comparator._fused_path_failed), they cannot kill the encode.
    tools/lowering_smoke.py full-compiles every signature for the
    pre-commit check."""
    return tuple(sorted({quant_search_nslots(h, w),
                         quant_search_nslots(*key)}))


def _probe_cache_file():
    """Cross-process probe-result store, colocated with the XLA compile
    cache. A probe's outcome is a pure function of (backend, kernel
    code, bucket, batch widths), so a fresh process can skip the ~40 s
    compile-and-run when an earlier process already validated the
    bucket on this backend. Only OK results persist — a transient
    failure re-probes next process rather than sticking."""
    if os.environ.get("GUETZLI_TPU_NO_PROBE_CACHE"):
        return None
    cache_dir = jax.config.jax_compilation_cache_dir
    if not cache_dir:
        return None
    return pathlib.Path(cache_dir) / "probe_ok.json"


@functools.lru_cache(maxsize=1)
def _probe_salt() -> str:
    """Invalidates persisted probe results when the kernel code or the
    backend changes."""
    h = hashlib.sha256()
    for mod in ("fused_pallas.py", "fused_staged.py"):
        p = pathlib.Path(__file__).parent / mod
        if p.exists():
            h.update(p.read_bytes())
    dev = jax.devices()[0]
    h.update(f"{jax.default_backend()}/{dev.device_kind}".encode())
    return h.hexdigest()[:16]


def _probe_cache_lookup(key, h, w):
    """Returns the persisted path ('mega'/'staged') for an OK bucket
    whose probed batch widths cover this call's, else None."""
    f = _probe_cache_file()
    if f is None or not f.exists():
        return None
    try:
        data = json.loads(f.read_text())
    except (OSError, ValueError):
        return None
    rec = data.get(f"{key[0]}x{key[1]}/{_probe_salt()}")
    if rec and set(_probe_batch_shapes(key, h, w)) <= set(rec["b"]):
        return rec["path"]
    return None


def _probe_cache_store(key, h, w, path):
    f = _probe_cache_file()
    if f is None:
        return
    try:
        data = json.loads(f.read_text()) if f.exists() else {}
        data[f"{key[0]}x{key[1]}/{_probe_salt()}"] = {
            "path": path, "b": sorted(_probe_batch_shapes(key, h, w))}
        tmp = f.with_suffix(".tmp")
        tmp.write_text(json.dumps(data, indent=1))
        tmp.replace(f)
    except OSError:
        pass


def probe_fused(lin: jax.Array, pi0, h: int, w: int) -> bool:
    """Hardware self-test of the fused kernel for this canvas bucket:
    compile + run it once at B=1 (result discarded; the encode's
    enclosing jitted programs compile their own copies — the probe
    validates that the kernel itself compiles/fits VMEM on this
    backend), then compile-check every batched shape the encode can
    emit (see _probe_batch_shapes; round 3's regression was a B>1-only
    lowering failure that a B=1-only probe was blind to). Returns
    False — and marks the BUCKET broken — on failure; callers fall back
    to the XLA metric path, which computes the same diffmap. One probe
    per (H, W) bucket per process, and OK outcomes persist next to the
    XLA compile cache so later processes skip the probe entirely (the
    cold-start cost was ~40 s per fresh CLI run; outcomes are keyed by
    backend + kernel-source hash, see _probe_salt). Locked per bucket
    so concurrent batch workers probing different buckets don't
    serialize."""
    key = bucket_key(*lin.shape[-2:])
    with _PROBE_LOCKS_GUARD:
        lock = _PROBE_LOCKS.setdefault(key, threading.Lock())
    with lock:
        if key in _BROKEN_BUCKETS:
            return False
        if key in _PROBED_OK:
            return True
        cached_path = _probe_cache_lookup(key, h, w)
        if cached_path is not None:
            _BUCKET_PATH.setdefault(key, cached_path)
            _PROBED_OK.add(key)
            return True
        while True:
            try:
                jax.block_until_ready(
                    fused_diffmap(lin, pi0, jnp.int32(h), jnp.int32(w)))
                for B in _probe_batch_shapes(key, h, w):
                    linb = jnp.broadcast_to(lin[None], (B,) + lin.shape)
                    pi0b = jnp.broadcast_to(
                        stack_pi0(pi0)[None], (B, 10) + lin.shape[-2:])
                    hb = jnp.full((B,), h, jnp.int32)
                    wb = jnp.full((B,), w, jnp.int32)
                    jax.jit(fused_diffmap_batch).lower(linb, pi0b,
                                                       hb, wb)
                _PROBED_OK.add(key)
                _probe_cache_store(key, h, w, _bucket_path(*key))
                return True
            except Exception as e:              # noqa: BLE001
                import sys
                detail = " ".join(str(e).split())[:1200]
                if _bucket_path(*key) == "mega":
                    # Mega kernel failed (VMEM/Mosaic): degrade this
                    # bucket to the stripe-tiled staged kernels and
                    # re-probe before giving up on the fused path.
                    _BUCKET_PATH[key] = "staged"
                    print(f"guetzli_tpu: mega metric kernel failed at "
                          f"bucket {key} ({type(e).__name__}); probing "
                          f"the staged kernels\n  detail: {detail}",
                          file=sys.stderr)
                    continue
                _BROKEN_BUCKETS.add(key)
                print(f"guetzli_tpu: fused metric kernel unavailable at "
                      f"bucket {key} ({type(e).__name__}); using the XLA "
                      f"metric path\n  detail: {detail}", file=sys.stderr)
                return False


# ---------------------------------------------------------------------------
# In-kernel building blocks (operate on VMEM-resident (H, W) f32 values).
# ---------------------------------------------------------------------------


def _pad_lr(x, r):
    if r == 0:
        return x
    z = jnp.zeros((x.shape[0], r), x.dtype)
    return jnp.concatenate([z, x, z], axis=1)


def _pad_tb(x, r):
    if r == 0:
        return x
    z = jnp.zeros((r, x.shape[1]), x.dtype)
    return jnp.concatenate([z, x, z], axis=0)


def _shift_blur(x, taps, h, w):
    """Separable zero-pad blur: W pass then H pass (the operand order of
    ops/blur.py's matmul form), unrolled shifted-adds."""
    r = len(taps) // 2
    xp = _pad_lr(x, r)
    acc = None
    for j, t in enumerate(taps):
        term = xp[:, j:j + w] * float(t)
        acc = term if acc is None else acc + term
    ap = _pad_tb(acc, r)
    acc2 = None
    for j, t in enumerate(taps):
        term = ap[j:j + h, :] * float(t)
        acc2 = term if acc2 is None else acc2 + term
    return acc2


def _malta_ssq(x, lf):
    """Sum over the 16 Malta patterns of squared line sums, zero-padded
    borders (metric/malta_pallas.py semantics, whole canvas)."""
    h, w = x.shape
    xp = _pad_tb(_pad_lr(x, 4), 4)
    pats = malta_mod.MALTA_PATTERNS_LF if lf else malta_mod.MALTA_PATTERNS
    acc = None
    for offs in pats:
        s = None
        for dy, dx in offs:
            sl = xp[4 + dy:4 + dy + h, 4 + dx:4 + dx + w]
            s = sl if s is None else s + sl
        acc = s * s if acc is None else acc + s * s
    return acc


def _diff_precompute(p0, p1, vh, vw, row, col):
    """mask.diff_precompute's dynamic-valid branch on kernel values."""
    def grad(p):
        fwd = jnp.concatenate([p[:, 1:], p[:, -1:]], axis=1)
        bwd = jnp.concatenate([p[:, :1], p[:, :-1]], axis=1)
        right = jnp.where(col == vw - 1, bwd, fwd)
        fwd = jnp.concatenate([p[1:, :], p[-1:, :]], axis=0)
        bwd = jnp.concatenate([p[:1, :], p[:-1, :]], axis=0)
        down = jnp.where(row == vh - 1, bwd, fwd)
        return jnp.abs(p - right) + jnp.abs(p - down)

    mul0 = 0.918416534734
    cutoff = 55.0184555849
    return jnp.minimum(mul0 * jnp.minimum(grad(p0), grad(p1)), cutoff)


# ---------------------------------------------------------------------------
# Stage bodies, shared by the single-program mega-kernel (small canvases)
# and the stripe-tiled staged kernels (fused_staged.py, megapixel
# canvases). Each takes a `blur` callback (x, sigma_index) -> blurred
# (index into SIGMAS) so callers control canvas vs slab blurs; all
# pointwise math traces the same jnp module functions the XLA path runs.
# ---------------------------------------------------------------------------


def stage_opsin(lin, blur):
    """[3 linear RGB planes] -> [3 XYB opsin-dynamics planes]
    (butteraugli.cc:324-366)."""
    blurred = [blur(lin[c], 0) for c in range(3)]
    m = opsin_mod.OPSIN_MIX

    def absorb(rgb):
        return [float(m[c, 0]) * rgb[0] + float(m[c, 1]) * rgb[1]
                + float(m[c, 2]) * rgb[2] + float(m[c, 3])
                for c in range(3)]

    pre = absorb(blurred)
    sens = [opsin_mod.gamma_fast(pre[c]) / pre[c] for c in range(3)]
    cur = [a * s for a, s in zip(absorb(lin), sens)]
    return [cur[0] - cur[1], cur[0] + cur[1], cur[2]]


def stage_freq(xyb, blur):
    """[3 XYB planes] -> PsychoImage (10 planes)
    (butteraugli.cc:489-622)."""
    lf = [blur(xyb[c], 1) for c in range(3)]
    res = [xyb[c] - lf[c] for c in range(3)]
    mf_blur = [blur(res[c], 2) for c in range(3)]
    hf_x = res[0] - mf_blur[0]
    hf_y = res[1] - mf_blur[1]
    mf_x = fr.remove_range_around_zero(0.120079806822, mf_blur[0])
    mf_y = fr.amplify_range_around_zero(0.03430529365, mf_blur[1])
    hf_x = fr.suppress_x_by_y(hf_x, hf_y, 2.96534974403)

    hfb_x = blur(hf_x, 3)
    hfb_y = blur(hf_y, 3)
    uhf_x = hf_x - hfb_x
    hf_x = fr.remove_range_around_zero(0.0287615200377, hfb_x)
    uhf_y = hf_y - hfb_y
    hf_y2 = fr.maximum_clamp(hfb_y, 78.8223237675)
    uhf_y = fr.maximum_clamp(uhf_y, 5.8907152736)
    uhf_y = fr._suppress_in_bright(uhf_y, lf[1], 1.76905001176,
                                   2000 * 0.310148420674)
    hf_y2 = fr._suppress_in_bright(hf_y2, lf[1], 1.10684769012,
                                   2000 * 0.478741530298)
    vx, vy, vb = fr.xyb_lowfreq_to_vals(lf[0], lf[1], lf[2])
    return PsychoImage(lf=(vx, vy, vb), mf=(mf_x, mf_y, mf_blur[2]),
                       hf=(hf_x, hf_y2), uhf=(uhf_x, uhf_y))
    # pi0 plane indices in the HBM stack: lf 0-2, mf 3-5, hf 6-7, uhf 8-9


def stage_terms(p0, pi1, blur, masked, diff_precompute):
    """pi0 loader (index -> plane) + candidate PsychoImage -> the six
    per-pixel accumulator planes the mask stage combines: (ac0, ac1,
    diff_x, diff_y, dlf2_x, dlf2_b) (butteraugli.cc:624-908). `masked`
    zeroes outside the valid region; `diff_precompute(a, b)` is the mask
    activity-gradient clamp."""
    from guetzli_tpu.metric.diffmap import (HF_ASYMMETRY,
                                            l2_diff_asymmetric)
    ha = HF_ASYMMETRY
    sqrt_ha = float(ha) ** 0.5
    MULLI = 0.354191303559
    MULLI_LF = 0.405371989604

    def msd(a, b_, w0, w1, norm, mulli):
        return masked(malta_mod.malta_scaled_diffs(a, b_, w0, w1, norm,
                                                   mulli=mulli))

    # Malta terms one at a time (pi0 plane liveness = one term).
    ac1 = _malta_ssq(msd(p0(9), pi1.uhf[1], 5.1409625726 * ha,
                         5.1409625726 / ha, 58.5001247061, MULLI),
                     lf=False)
    ac0 = _malta_ssq(msd(p0(8), pi1.uhf[0], 4.91743441556 * ha,
                         4.91743441556 / ha, 687196.39002, MULLI),
                     lf=False)
    p0hf1 = p0(7)    # reused: malta, SameNoise, L2-asym, activity
    ac1 = ac1 + _malta_ssq(
        msd(p0hf1, pi1.hf[1], 153.671655716 * sqrt_ha,
            153.671655716 / sqrt_ha, 83150785.9592, MULLI_LF), lf=True)
    p0hf0 = p0(6)    # reused: malta, activity
    ac0 = ac0 + _malta_ssq(
        msd(p0hf0, pi1.hf[0], 668.358918152 * sqrt_ha,
            668.358918152 / sqrt_ha, 0.882954368025, MULLI_LF), lf=True)
    ac1 = ac1 + _malta_ssq(
        msd(p0(4), pi1.mf[1], 6841.81248144, 6841.81248144,
            0.0135134962487, MULLI_LF), lf=True)
    ac0 = ac0 + _malta_ssq(
        msd(p0(3), pi1.mf[0], 813.901703816, 813.901703816,
            16792.9322251, MULLI_LF), lf=True)

    # SameNoiseLevels (butteraugli.cc:624-652,888)
    snl_w, snl_maxclamp = 884.809801415, 85.7047444518
    v0 = jnp.minimum(jnp.abs(p0hf1), snl_maxclamp)
    v1 = jnp.minimum(jnp.abs(pi1.hf[1]), snl_maxclamp)
    snl_diff = blur(v0 - v1, 4)
    ac1 = ac1 + snl_w * snl_diff * snl_diff

    # L2 terms (zero-weighted wmul channels skipped; exact zeros).
    wmul1, wmul6, wmul8 = 32.4449876135, 1.01370836411, 1.74566011615
    ac1 = ac1 + l2_diff_asymmetric(p0hf1, pi1.hf[1], wmul1 * ha,
                                   wmul1 / ha)

    # Mask activity differences (butteraugli.cc:1741-1756)
    muls = (0.0, 1.64178305129, 0.831081703362, 3.23680933546)
    act0_x = muls[1] * p0hf0                      # muls[0] * uhf0 == 0
    act0_y = muls[2] * p0(9) + muls[3] * p0hf1
    act1_x = muls[1] * pi1.hf[0]
    act1_y = muls[2] * pi1.uhf[1] + muls[3] * pi1.hf[1]
    diff_x = diff_precompute(act0_x, act1_x)
    diff_y = diff_precompute(act0_y, act1_y)

    # DC L2 terms (mask-independent factors; lf planes live one each).
    w_ytob_lf = 21.6804277046
    dlf = p0(0) - pi1.lf[0]
    dlf2_x = wmul6 * dlf * dlf
    dlf = p0(2) - pi1.lf[2]
    dlf2_b = w_ytob_lf * (wmul8 * dlf * dlf)
    return ac0, ac1, diff_x, diff_y, dlf2_x, dlf2_b


def stage_mask_final(ac0, ac1, diff_x, diff_y, dlf2_x, dlf2_b, blur,
                     masked):
    """Six term planes -> final diffmap (butteraugli.cc:718-751,
    1638-1817)."""
    b_r2 = blur(diff_x, 5)
    b_r0 = blur(diff_y, 6)
    b_r1 = blur(diff_y, 7)

    muls0 = 0.207017089891
    muls1 = 0.267138152891
    s1 = (muls0 * b_r0 + muls1 * b_r1) / (muls0 + muls1)
    mul0 = 16.6963293877
    mul1 = 2.1364621982
    w00 = 36.4671237619
    w11 = 2.1887170895
    p1m = mul1 * w11 * s1
    p0m = mul0 * w00 * b_r2 + 0.0513061271723 * p1m
    m_x = mask_mod.mask_x(p0m)
    m_y = mask_mod.mask_y(p1m)
    md_x = mask_mod.mask_dc_x(p0m)
    md_y = mask_mod.mask_dc_y(p1m)

    combined = (md_x * dlf2_x + md_y * dlf2_b
                + m_x * ac0 + m_y * ac1)
    combined = masked(combined)

    # CalculateDiffmap (butteraugli.cc:718-751)
    k_initial_slope = 100.0
    d = jnp.where(combined < 1.0 / (k_initial_slope * k_initial_slope),
                  k_initial_slope * combined,
                  jnp.sqrt(jnp.maximum(combined, 0.0)))
    cmul1 = 0.458794906198
    scale = 1.0 / (1.0 + cmul1)
    return masked((d + cmul1 * blur(d, 8)) * scale)


def _kernel(hw_ref, lin_hbm, pi0_hbm, invh_ref, invw_ref, out_ref,
            scratch, sems):
    H, W = out_ref.shape[-2:]
    b = pl.program_id(0)
    # hw_ref is the WHOLE (B, 2) array in SMEM (unblocked): a (1, 2)
    # block over it fails Mosaic's block-mapping check for any B > 1
    # (second-to-last block dim must divide 8 or equal the array dim),
    # which is exactly the batched-compare lowering crash of round 3.
    vh = hw_ref[b, 0]
    vw = hw_ref[b, 1]
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    vmask = ((row < vh) & (col < vw)).astype(jnp.float32)

    # HBM plane loads: 2-slot rotation; the returned SSA value's VMEM
    # lifetime ends at its last use, which is what bounds peak memory.
    slot = [0]

    def load(plane_ref):
        s = slot[0]
        slot[0] = 1 - s
        dma = pltpu.make_async_copy(plane_ref, scratch.at[s], sems.at[s])
        dma.start()
        dma.wait()
        return scratch[s]

    def blur_p(x, si):
        taps = blur_mod._kernel_np(SIGMAS[si][0])
        out = _shift_blur(x * vmask, taps, H, W)
        return out * invh_ref[0, si] * invw_ref[0, si]

    def masked(x):
        return x * vmask

    lin = [load(lin_hbm.at[b, c]) for c in range(3)]
    xyb = stage_opsin(lin, blur_p)
    pi1 = stage_freq(xyb, blur_p)
    terms = stage_terms(lambda k: load(pi0_hbm.at[b, k]), pi1, blur_p,
                        masked,
                        lambda a, b_: _diff_precompute(a, b_, vh, vw,
                                                       row, col))
    out_ref[0] = stage_mask_final(*terms, blur_p, masked)


# ---------------------------------------------------------------------------
# Host-side wrappers.
# ---------------------------------------------------------------------------


def _inv_weights(h, w, H: int, W: int):
    """(9, H, 1) and (9, 1, W) border-renormalization vectors for the
    true dims (h, w) inside the (H, W) canvas (same `_weights_dyn` values
    the XLA blur path applies)."""
    invh = jnp.stack([blur_mod._weights_dyn(s, H, br, h)
                      for s, br in SIGMAS])
    invw = jnp.stack([blur_mod._weights_dyn(s, W, br, w)
                      for s, br in SIGMAS])
    return invh[:, :, None], invw[:, None, :]


def stack_pi0(pi0: PsychoImage) -> jax.Array:
    """PsychoImage -> (10, H, W): lf, mf, hf, uhf in kernel order."""
    return jnp.concatenate([jnp.asarray(pi0.lf), jnp.asarray(pi0.mf),
                            jnp.asarray(pi0.hf), jnp.asarray(pi0.uhf)])


def _prep_aux(h: jax.Array, w: jax.Array, H: int, W: int):
    """(B,) true dims -> ((B, 2) hw, (B, 9, H, 1) invh, (B, 9, 1, W)
    invw) kernel operands. Computed OUTSIDE the custom_vmap'd entry:
    building these embeds the 18 per-sigma blur prefix tables as jaxpr
    consts, and jax.custom_vmap asserts its function's consts are
    unbatched — a vmapped lax.while_loop whose predicate is batched
    (the refine chunk's per-lane phase_done) broadcasts body consts,
    tripping that assert at trace time. With the aux passed as formal
    args the custom_vmap jaxpr is const-free and batches cleanly."""
    invh, invw = jax.vmap(lambda hh, ww: _inv_weights(hh, ww, H, W))(h, w)
    hw = jnp.stack([h, w], axis=1).astype(jnp.int32)
    return hw, invh, invw


def _mega_pallas_call(lin: jax.Array, pi0_stack: jax.Array,
                      hw: jax.Array, invh: jax.Array, invw: jax.Array,
                      interpret: bool) -> jax.Array:
    """The raw mega-kernel launch at tile-aligned (H, W)."""
    B, _, H, W = lin.shape
    return pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # hw: whole (B, 2)
            pl.BlockSpec(memory_space=pl.ANY),        # lin (HBM)
            pl.BlockSpec(memory_space=pl.ANY),        # pi0 (HBM)
            pl.BlockSpec((1, 9, H, 1), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, 1, W), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, H, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=compiler_params(),
        interpret=interpret,
    )(hw, lin, pi0_stack, invh, invw)


@jax.custom_batching.custom_vmap
def _fused_diffmap_batch_tpu(lin: jax.Array, pi0_stack: jax.Array,
                             hw: jax.Array, invh: jax.Array,
                             invw: jax.Array) -> jax.Array:
    """Hardware (non-interpret) fused diffmap at tile-aligned (H, W),
    with a custom vmap rule: the kernels are elementwise over their
    leading batch axis (grid lanes), so vmapping = flattening the new
    axis into that grid. Without this rule, jax.vmap batches the
    pallas_call itself by prepending a grid dim with non-trivial HBM
    index maps, which Mosaic refuses to lower ("memory space ANY only
    blocks having the same block shape as the array") — every vmapped
    caller (batch-mode quant search/refine groups) would lose the fused
    path. Flattening is also faster: a (G, B)-nested call becomes ONE
    G*B-lane launch. Takes the precomputed (hw, invh, invw) aux (see
    _prep_aux) so its jaxpr closes over no array consts."""
    H, W = lin.shape[-2:]
    if _bucket_path(H, W) == "staged":
        from guetzli_tpu.metric import fused_staged
        return fused_staged.staged_pallas_calls(lin, pi0_stack, hw,
                                                invh, invw,
                                                interpret=False)
    return _mega_pallas_call(lin, pi0_stack, hw, invh, invw,
                             interpret=False)


@_fused_diffmap_batch_tpu.def_vmap
def _fused_diffmap_vmap_rule(axis_size, in_batched, lin, pi0_stack, hw,
                             invh, invw):
    def bcast(x, batched):
        if batched:
            return x
        return jnp.broadcast_to(x[None], (axis_size,) + x.shape)

    lin, pi0_stack, hw, invh, invw = (
        bcast(x, b) for x, b in zip((lin, pi0_stack, hw, invh, invw),
                                    in_batched))
    B = lin.shape[1]
    out = _fused_diffmap_batch_tpu(
        *(x.reshape((-1,) + x.shape[2:])
          for x in (lin, pi0_stack, hw, invh, invw)))
    # out: (axis_size * B, H, W) -> (axis_size, B, H, W)
    return out.reshape((axis_size, B) + out.shape[1:]), True


def fused_diffmap_batch(lin: jax.Array, pi0_stack: jax.Array,
                        h: jax.Array, w: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """(B, 3, H, W) linear RGB + (B, 10, H, W) original PsychoImage ->
    (B, H, W) diffmaps; (h, w) are (B,) true dims."""
    B, _, H, W = lin.shape
    # Non-TPU backends (CPU tests with GUETZLI_TPU_FUSED_METRIC=1) run
    # the kernels through the Pallas interpreter.
    interpret = interpret or jax.default_backend() != "tpu"
    # Mosaic restriction: in-kernel channel slices of a VMEM ref whose
    # lane (last) dim is not a multiple of the 128 tiling fail to compile
    # ("Slice shape along dimension 3 must be aligned to tiling (128)").
    # Pad the canvas to tile multiples here and crop the result; the
    # padded region is more canvas zeros (true dims h/w drive masked()
    # and the blur renormalization weights), so values inside the
    # original canvas are untouched. The mega/staged dispatch decision
    # is made on the PADDED dims — they are what the kernel compiles at
    # (and what its VMEM liveness scales with).
    Hp, Wp = -(-H // 8) * 8, -(-W // 128) * 128
    if (Hp, Wp) != (H, W):
        pad = [(0, 0), (0, 0), (0, Hp - H), (0, Wp - W)]
        dm = fused_diffmap_batch(jnp.pad(lin, pad),
                                 jnp.pad(pi0_stack, pad), h, w,
                                 interpret=interpret)
        return dm[:, :H, :W]
    hw, invh, invw = _prep_aux(h, w, H, W)
    if interpret:
        if _bucket_path(H, W) == "staged":
            from guetzli_tpu.metric import fused_staged
            return fused_staged.staged_pallas_calls(lin, pi0_stack, hw,
                                                    invh, invw,
                                                    interpret=True)
        return _mega_pallas_call(lin, pi0_stack, hw, invh, invw,
                                 interpret=True)
    return _fused_diffmap_batch_tpu(lin, pi0_stack, hw, invh, invw)


def fused_diffmap(lin: jax.Array, pi0: PsychoImage, h, w,
                  interpret: bool = False) -> jax.Array:
    """(3, H, W) candidate linear RGB -> (H, W) diffmap vs pi0."""
    dm = fused_diffmap_batch(lin[None], stack_pi0(pi0)[None],
                             jnp.asarray(h, jnp.int32)[None],
                             jnp.asarray(w, jnp.int32)[None],
                             interpret=interpret)
    return dm[0]
