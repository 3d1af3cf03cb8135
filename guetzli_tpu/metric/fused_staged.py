"""Stripe-tiled staged butteraugli metric for megapixel canvases.

The single-program mega-kernel (fused_pallas._kernel) keeps the whole
canvas's ~27 live planes in VMEM, which caps it at ~146k pixels. This
module runs the SAME four stage bodies (fused_pallas.stage_opsin /
stage_freq / stage_terms / stage_mask_final — identical math, identical
constants) as four stripe-tiled Pallas kernels with HBM handoffs
between stages:

    lin (3) --K1:opsin-->  xyb (3) --K2:freq--> pi1 (10)
    pi0 (10) + pi1 (10) --K3:terms--> terms (6) --K4:mask--> diffmap

Each kernel grids over (image, row-stripe). A stripe loads
`core + 2*halo` input rows (the stage's accumulated blur/stencil
receptive field) and writes `core` exact output rows, so VMEM holds
only slab-sized values. Zero-padding the inputs by `halo` rows
reproduces the full-canvas zero-pad blur semantics exactly: values a
stage computes at in-canvas rows are bit-identical to the mega
kernel's (same shift-add order, same border renormalization vectors),
and out-of-canvas halo rows are zeros on load and zeroed by the
blur-weight vectors on output.

Per-stage halos (radius r = len(_kernel_np(sigma)) // 2):
    K1 opsin      2   (sigma 1.2)
    K2 freq      28   (lf 16 + mf 8 + uhf 4, cascaded)
    K3 terms     23   (SameNoiseLevels sigma 10.67; malta needs 4)
    K4 mask      23   (mask blurs r=20 + final diffmap blur r=3)

Reference: third_party/butteraugli/butteraugli/butteraugli.cc:324-366,
489-622, 624-908, 1638-1817 (same anchors as fused_pallas.py).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from guetzli_tpu.metric import fused_pallas as fp
from guetzli_tpu.ops import blur as blur_mod

# Stage halos (see module docstring), rounded UP to a multiple of 8:
# Mosaic requires VMEM memref slices to be (8, 128)-tile aligned
# ("Slice shape along dimension 2 must be aligned to tiling (8)" on
# hardware for the 132-row opsin slab), and slab = core + 2*halo with a
# 16-multiple core, so halo % 4 == 0 makes every slab 8-aligned; % 8
# also keeps the in-slab output crop offset sublane-aligned. Extra halo
# rows beyond the receptive field are exact (they're real canvas/zero
# rows; the output crop discards them) — only stripe overlap grows.
# Receptive fields: opsin 2 (sigma 1.2), freq 28 (lf 16 + mf 8 +
# uhf 4, cascaded), terms 23 (SameNoiseLevels sigma 10.67; malta 4),
# mask 23 (mask blurs r=20 + final diffmap blur r=3).
HALO = {"opsin": 8, "freq": 32, "terms": 24, "mask": 24}

# Per-stage slab-plane-equivalent liveness (how many (slab, W) f32
# planes Mosaic keeps live through the stage body, measured/bounded on
# v5e: the freq cascade reported a 16.98 MB scoped allocation at a
# 112x512 slab => ~74 equivalents incl. out block + scratch; the others
# are padded guesses — a bad guess fails the bucket probe, which
# degrades to the XLA path rather than crashing).
_PLANE_EQUIV = {"opsin": 35, "freq": 85, "terms": 85, "mask": 75}

# Stripe VMEM budget: v5e has 128 MB physical VMEM; leave headroom for
# in/out blocks, invh/invw, and compiler slack (mask at a 352-row slab
# measured 137.5 MB total -> ~64 plane equivalents).
_SLAB_BUDGET = int(os.environ.get("GUETZLI_TPU_STAGED_SLAB_BUDGET",
                                  80 * 1024 * 1024))


def _core_rows(stage: str, W: int) -> int:
    """Largest 16-multiple core such that the stage's slab working set
    (plane equivalents x slab rows x W x 4 B) fits the budget. Bigger
    cores amortize the fixed 2*halo overlap rows per stripe."""
    slab_max = _SLAB_BUDGET // (_PLANE_EQUIV[stage] * W * 4)
    s = slab_max - 2 * HALO[stage]
    return max(16, min(512, (s // 16) * 16))


def _pad_rows(x: jax.Array, halo: int, hp: int) -> jax.Array:
    """(..., H, W) -> (..., hp + 2*halo, W), zero rows outside."""
    h = x.shape[-2]
    cfg = [(0, 0)] * (x.ndim - 2) + [(halo, hp - h + halo), (0, 0)]
    return jnp.pad(x, cfg)


def _blocked_invh(invh: jax.Array, halo: int, hp: int, S: int
                  ) -> jax.Array:
    """(B, 9, H, 1) canvas row weights -> (B, NS, S + 2*halo, 9)
    per-stripe blocks in slab coordinates (zeros outside the canvas,
    which also zeroes every out-of-canvas blur output row)."""
    B, n, H, _ = invh.shape
    flat = jnp.transpose(invh[..., 0], (0, 2, 1))      # (B, H, 9)
    flat = jnp.pad(flat, ((0, 0), (halo, hp - H + halo), (0, 0)))
    ns = hp // S
    idx = (jnp.arange(ns)[:, None] * S
           + jnp.arange(S + 2 * halo)[None, :])        # (NS, S+2h)
    return flat[:, idx, :]                             # (B, NS, S+2h, 9)


def _make_stage(stage: str, n_in_arrays, n_out_planes, body):
    """Builds a stripe-tiled pallas_call wrapper for one stage.

    body(loads, blur, masked, ctx) -> list of n_out_planes slab values;
    `loads` is a list of per-input-array loader fns (plane -> slab),
    ctx carries (vh, vw, row, col) in global canvas coordinates."""
    halo = HALO[stage]

    def kernel(hw_ref, *refs):
        # refs: n_in HBM arrays, invh_blk, invw, out_ref, scratch, sems
        ins = refs[:n_in_arrays]
        invh_ref = refs[n_in_arrays]
        invw_ref = refs[n_in_arrays + 1]
        out_ref = refs[n_in_arrays + 2]
        scratch = refs[n_in_arrays + 3]
        sems = refs[n_in_arrays + 4]
        S = out_ref.shape[-2]
        W = out_ref.shape[-1]
        slab = S + 2 * halo
        b = pl.program_id(0)
        s = pl.program_id(1)
        # Whole (B, 2) array in SMEM, indexed by program id: a (1, 2)
        # block fails Mosaic's block-mapping check for B > 1.
        vh = hw_ref[b, 0]
        vw = hw_ref[b, 1]
        row = (jax.lax.broadcasted_iota(jnp.int32, (slab, W), 0)
               + s * S - halo)
        col = jax.lax.broadcasted_iota(jnp.int32, (slab, W), 1)
        vmask = ((row < vh) & (col < vw)).astype(jnp.float32)

        slot = [0]

        def load_from(ref):
            def load(plane):
                sl = slot[0]
                slot[0] = 1 - sl
                dma = pltpu.make_async_copy(
                    ref.at[b, plane, pl.ds(s * S, slab)],
                    scratch.at[sl], sems.at[sl])
                dma.start()
                dma.wait()
                return scratch[sl]
            return load

        def blur_s(x, si):
            taps = blur_mod._kernel_np(fp.SIGMAS[si][0])
            out = fp._shift_blur(x * vmask, taps, slab, W)
            return (out * invh_ref[0, 0, :, si:si + 1]
                    * invw_ref[0, si][None, :])

        def masked(x):
            return x * vmask

        outs = body([load_from(r) for r in ins], blur_s, masked,
                    (vh, vw, row, col))
        for p, v in enumerate(outs):
            if n_out_planes == 1:
                out_ref[0] = v[halo:halo + S]
            else:
                out_ref[0, p] = v[halo:halo + S]

    def run(in_arrays, invh, invw, hw, H, W, interpret):
        """in_arrays: list of (B, P, H, W); returns (B, out, H, W)
        (or (B, H, W) when n_out_planes == 1)."""
        B = in_arrays[0].shape[0]
        S = _core_rows(stage, W)
        ns = -(-H // S)
        hp = ns * S
        ins_p = [_pad_rows(a, halo, hp) for a in in_arrays]
        invh_blk = _blocked_invh(invh, halo, hp, S)
        slab = S + 2 * halo
        out_shape = (jax.ShapeDtypeStruct((B, hp, W), jnp.float32)
                     if n_out_planes == 1 else
                     jax.ShapeDtypeStruct((B, n_out_planes, hp, W),
                                          jnp.float32))
        out_spec = (pl.BlockSpec((1, S, W), lambda b, s: (b, s, 0),
                                 memory_space=pltpu.VMEM)
                    if n_out_planes == 1 else
                    pl.BlockSpec((1, n_out_planes, S, W),
                                 lambda b, s: (b, 0, s, 0),
                                 memory_space=pltpu.VMEM))
        out = pl.pallas_call(
            kernel,
            grid=(B, ns),
            in_specs=(
                [pl.BlockSpec(memory_space=pltpu.SMEM)]  # hw: whole (B, 2)
                # Big inputs stay in HBM (DMA'd per plane into the
                # 2-slot scratch); pl.ANY would let the compiler place
                # a megapixel padded input wholly in VMEM.
                + [pl.BlockSpec(memory_space=pltpu.HBM)] * n_in_arrays
                + [pl.BlockSpec((1, 1, slab, 9),
                                lambda b, s: (b, s, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 9, W), lambda b, s: (b, 0, 0),
                                memory_space=pltpu.VMEM)]),
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((2, slab, W), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=fp.compiler_params(),
            interpret=interpret,
        )(hw, *ins_p, invh_blk, invw)
        return out[:, :H] if n_out_planes == 1 else out[:, :, :H]

    return run


def _opsin_body(loads, blur, masked, ctx):
    lin = [loads[0](c) for c in range(3)]
    return fp.stage_opsin(lin, blur)


def _freq_body(loads, blur, masked, ctx):
    xyb = [loads[0](c) for c in range(3)]
    pi1 = fp.stage_freq(xyb, blur)
    return list(pi1.lf) + list(pi1.mf) + list(pi1.hf) + list(pi1.uhf)


def _terms_body(loads, blur, masked, ctx):
    vh, vw, row, col = ctx
    cache = {}

    def pi1_plane(k):
        if k not in cache:
            cache[k] = loads[1](k)
        return cache[k]

    pi1 = fp.PsychoImage(
        lf=tuple(pi1_plane(k) for k in (0, 1, 2)),
        mf=tuple(pi1_plane(k) for k in (3, 4, 5)),
        hf=tuple(pi1_plane(k) for k in (6, 7)),
        uhf=tuple(pi1_plane(k) for k in (8, 9)))
    p0cache = {}

    def p0(k):
        if k not in p0cache:
            p0cache[k] = loads[0](k)
        return p0cache[k]

    return list(fp.stage_terms(
        p0, pi1, blur, masked,
        lambda a, b_: fp._diff_precompute(a, b_, vh, vw, row, col)))


def _mask_body(loads, blur, masked, ctx):
    planes = [loads[0](k) for k in range(6)]
    return [fp.stage_mask_final(*planes, blur, masked)]


_RUN_OPSIN = _make_stage("opsin", 1, 3, _opsin_body)
_RUN_FREQ = _make_stage("freq", 1, 10, _freq_body)
_RUN_TERMS = _make_stage("terms", 2, 6, _terms_body)
_RUN_MASK = _make_stage("mask", 1, 1, _mask_body)


def staged_pallas_calls(lin: jax.Array, pi0_stack: jax.Array,
                        hw: jax.Array, invh: jax.Array,
                        invw: jax.Array, interpret: bool) -> jax.Array:
    """The four staged launches at 128-aligned W (the aligned core that
    fused_pallas dispatches to; its custom vmap rule flattens batch
    axes into the stage grids). (hw, invh, invw) come precomputed from
    fp._prep_aux so this function stays const-free under custom_vmap
    (see _prep_aux's docstring)."""
    B, _, H, W = lin.shape
    invw = invw[:, :, 0, :]                       # (B, 9, W)

    xyb = _RUN_OPSIN([lin], invh, invw, hw, H, W, interpret)
    pi1 = _RUN_FREQ([xyb], invh, invw, hw, H, W, interpret)
    terms = _RUN_TERMS([pi0_stack, pi1], invh, invw, hw, H, W,
                       interpret)
    return _RUN_MASK([terms], invh, invw, hw, H, W, interpret)


def staged_diffmap_batch(lin: jax.Array, pi0_stack: jax.Array,
                         h: jax.Array, w: jax.Array,
                         interpret: bool = False) -> jax.Array:
    """(B, 3, H, W) linear RGB + (B, 10, H, W) original PsychoImage ->
    (B, H, W) diffmaps; (h, w) are (B,) true dims. Megapixel-capable
    staged twin of fused_pallas.fused_diffmap_batch."""
    B, _, H, W = lin.shape
    interpret = interpret or jax.default_backend() != "tpu"
    Wp = -(-W // 128) * 128
    if Wp != W:
        pad = [(0, 0), (0, 0), (0, 0), (0, Wp - W)]
        dm = staged_diffmap_batch(jnp.pad(lin, pad),
                                  jnp.pad(pi0_stack, pad), h, w,
                                  interpret=interpret)
        return dm[:, :, :W]
    hw, invh, invw = fp._prep_aux(h, w, H, W)
    return staged_pallas_calls(lin, pi0_stack, hw, invh, invw, interpret)
