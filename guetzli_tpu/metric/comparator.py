"""Comparator: the metric + acceptance API the optimizer drives.

Mirrors the reference interface (guetzli/comparator.h:29-96 and
guetzli/butteraugli_comparator.{h,cc}) with a TPU-resident implementation:
the original image's psycho-image is computed once on device; every
candidate comparison is one fused jitted pipeline. Block comparisons are
exposed in batched form (all blocks at once) rather than the reference's
SwitchBlock/CompareBlock per-block protocol — the vmapped zeroing search
consumes them directly.
"""

from __future__ import annotations

import abc
import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from guetzli_tpu.metric import block_diff
from guetzli_tpu.metric.diffmap import diffmap_psycho_image
from guetzli_tpu.metric.frequencies import separate_frequencies
from guetzli_tpu.metric.mask import mask as mask_fn
from guetzli_tpu.metric.opsin import opsin_dynamics_image
from guetzli_tpu.ops.gamma import srgb8_to_linear_fast as srgb8_to_linear
from guetzli_tpu.search.score import score_jpeg


import os as _os

# Size-bucketed compilation (default ON): images are placed in the
# top-left of a padded canvas whose dims come from a small geometric
# ladder, with the true (h, w) as runtime scalars — so one compiled
# executable serves every image size in a bucket instead of a 2-4 min
# XLA compile per novel size. Opt out with GUETZLI_TPU_NO_BUCKETS=1
# (exact round-1 behavior, per-size executables).
_BUCKETS = not _os.environ.get("GUETZLI_TPU_NO_BUCKETS")


def check_finite_distance(value, context: str):
    """NaN/Inf guard on metric results as they land on host — the analog
    of the reference's BUTTERAUGLI_ENABLE_CHECKS (butteraugli.h:31),
    always on (the value is already host-resident, the check is free).
    A NaN in the diffmap propagates through the max-reduction to the
    distance scalar; without this it would silently make every
    distance_ok() False and quietly inflate outputs.

    Accepts a scalar or ndarray; returns the value for chaining."""
    ok = np.isfinite(value) if np.isscalar(value) else \
        bool(np.all(np.isfinite(value)))
    if not ok:
        raise FloatingPointError(
            f"guetzli_tpu: non-finite butteraugli distance ({value!r}) "
            f"from {context}; refusing to continue with a poisoned "
            f"metric (NaN would silently disable distance_ok)")
    return value


def bucket_dim(s: int) -> int:
    """Smallest ladder dim >= s: multiples of 16, ratio ~1.25 from 64
    (64, 80, 112, 144, 192, 240, 304, 384, 480, 608, 768, 960, 1200,
    1504, 1888, 2368, 2960, 3712, ...). Max pixel waste ~1.27x per dim."""
    b = 64
    while b < s:
        b = -(-(b + (b >> 2)) // 16) * 16
    return b


class Comparator(abc.ABC):
    """Abstract metric/acceptance interface (reference comparator.h)."""

    @abc.abstractmethod
    def compare(self, img) -> None: ...

    @abc.abstractmethod
    def distance_ok(self, target_mul: float) -> bool: ...

    @abc.abstractmethod
    def distmap(self) -> np.ndarray: ...

    @abc.abstractmethod
    def score_output_size(self, size: int) -> float: ...

    @abc.abstractmethod
    def block_error_limit(self) -> float: ...


@functools.partial(jax.jit, static_argnames=())
def _full_diffmap(pi0, xyb1):
    pi1 = separate_frequencies(xyb1)
    d = diffmap_psycho_image(pi0, pi1)
    return d, jnp.max(d)


@jax.jit
def _opsin_from_linear(lin):
    return opsin_dynamics_image(lin)


@functools.partial(jax.jit, static_argnames=("factor_x", "factor_y",
                                             "direction", "max_block_dist",
                                             "width", "height"))
def _block_weights(distmap, target_distance, factor_x, factor_y,
                   direction, max_block_dist, width, height):
    """Vectorized ComputeBlockErrorAdjustmentWeights
    (reference guetzli/butteraugli_comparator.cc:494-558)."""
    sizex, sizey = 8 * factor_x, 8 * factor_y
    bw = -(-width // sizex)
    bh = -(-height // sizey)
    # max distance inside each block (pad to block grid with -inf -> 0).
    pad_y, pad_x = bh * sizey - height, bw * sizex - width
    dm = jnp.pad(distmap, ((0, pad_y), (0, pad_x)),
                 constant_values=-jnp.inf)
    mdpb = jax.lax.reduce_window(dm, -jnp.inf, jax.lax.max,
                                 (sizey, sizex), (sizey, sizex), "VALID")
    mdpb = jnp.maximum(mdpb, 0.0)

    r = max_block_dist
    mld = jax.lax.reduce_window(mdpb, -jnp.inf, jax.lax.max,
                                (2 * r + 1, 2 * r + 1), (1, 1), "SAME")
    mld = jnp.maximum(mld, target_distance)

    if direction > 0:
        w = jnp.where((mdpb <= target_distance)
                      & (mld <= 1.1 * target_distance), 1.0, 0.0)
        return w
    # direction < 0: triggering blocks spread 1/(d+1) into their
    # chebyshev-d neighborhoods.
    k_local = 0.5
    trig = mdpb > ((1 - k_local) * target_distance + k_local * mld)
    w = jnp.zeros_like(mdpb)
    t = trig.astype(distmap.dtype)
    for d in range(0, r + 1):
        if d == 0:
            dil = t
        else:
            dil = jax.lax.reduce_window(t, 0.0, jax.lax.max,
                                        (2 * d + 1, 2 * d + 1), (1, 1),
                                        "SAME")
        w = jnp.maximum(w, dil / (d + 1.0))
    return w


@functools.partial(jax.jit, static_argnames=())
def _precompute_pi0_dyn(lin, h, w):
    """Padded-canvas psycho-image precompute with true dims (h, w)."""
    xyb = opsin_dynamics_image(lin, (h, w))
    return xyb, separate_frequencies(xyb, (h, w))


@functools.partial(jax.jit, static_argnames=())
def _precompute_pi0_u8(pad_u8, h, w):
    """uint8 (3, H, W) padded canvas -> (linear, xyb0, pi0), one device
    program (the eager srgb conversion paid per-op tunnel dispatches)."""
    lin = srgb8_to_linear(pad_u8)
    xyb = opsin_dynamics_image(lin, (h, w))
    return lin, xyb, separate_frequencies(xyb, (h, w))


@jax.jit
def _block_opsin_u8(pad_u8: jax.Array) -> jax.Array:
    """uint8 (3, nby*8, nbx*8) edge-padded canvas -> (nby, nbx, 3, 8, 8)
    per-tile opsin, one launch (the srgb conversion + tile regroup +
    vmapped opsin ran eagerly before: per-op tunnel dispatches)."""
    _, H, W = pad_u8.shape
    nby, nbx = H // 8, W // 8
    lin = srgb8_to_linear(pad_u8)
    tiles = lin.reshape(3, nby, 8, nbx, 8).transpose(1, 3, 0, 2, 4)
    xyb = block_diff.opsin_tiles(tiles.reshape(-1, 3, 8, 8))
    return xyb.reshape(nby, nbx, 3, 8, 8)


@jax.jit
def _mask_self_dyn(xyb0, h, w):
    return mask_fn(xyb0, xyb0, (h, w))


def _decode_linear(coeffs, width, height, factors, valid_hw=None):
    """Coefficient state -> (3, H, W) decoded linear RGB (pixel planes
    -> sRGB -> linear; reference output_image.cc ToSRGB semantics)."""
    from guetzli_tpu.image.output_image import (fancy_upsample_16,
                                                fancy_upsample_16_dyn,
                                                idct_pixels16,
                                                ycbcr_planes_to_srgb)

    planes = []
    for c in range(3):
        sub = idct_pixels16(coeffs[c])
        if factors[c] == 1:
            planes.append(sub[:height, :width])
        elif valid_hw is None:
            planes.append(fancy_upsample_16(sub, height, width))
        else:
            planes.append(fancy_upsample_16_dyn(sub, valid_hw[0],
                                                valid_hw[1], height,
                                                width))
    return srgb8_to_linear(ycbcr_planes_to_srgb(*planes))


def _diffmap_from_coeffs(coeffs, pi0, width, height, factors,
                         valid_hw=None, fused=False):
    """Coefficient state -> diffmap: decoded linear RGB -> opsin ->
    frequency cascade -> psycho diffmap (the metric's forward pass;
    reference butteraugli_comparator.cc:63-75).

    fused=True (static): the metric (everything after the decoded linear
    RGB) runs as ONE Pallas program (metric/fused_pallas.py) instead of
    ~85 XLA launches — only valid for bucketed small canvases, never
    under sp-sharding."""
    lin = _decode_linear(coeffs, width, height, factors, valid_hw)
    if fused and valid_hw is not None:
        from guetzli_tpu.metric.fused_pallas import fused_diffmap
        return fused_diffmap(lin, pi0, valid_hw[0], valid_hw[1])
    xyb1 = opsin_dynamics_image(lin, valid_hw)
    pi1 = separate_frequencies(xyb1, valid_hw)
    return diffmap_psycho_image(pi0, pi1, valid_hw)


def _compare_coeffs_impl(coeffs, pi0, target_distance, width, height,
                         factors, wfactor, valid_hw=None, fused=False):
    """One device call per optimizer iteration: host coefficient mirror ->
    pixel planes -> sRGB -> linear -> opsin -> diffmap -> distance, plus the
    block-error adjustment weight grids for both directions x rblock 1..4
    (what the next iteration's global-order build needs). Returns
    (distmap, packed) where packed = [distance, weights.ravel()] so the host
    pays a single round trip.

    coeffs: tuple of 3 (nby_c, nbx_c, 64) int32 arrays, or one packed
    (3, nby, nbx, 64) array when all components share a grid (444 — one
    host->device transfer instead of three); factors: static per-comp
    sampling factor (1 or 2); wfactor: the masking pass's block factor.

    valid_hw: optional traced (h, w) when width/height are a padded size
    bucket; all border semantics then land at the true (h, w) edge and
    the returned distmap is zero outside the valid region."""
    dmap = _diffmap_from_coeffs(coeffs, pi0, width, height, factors,
                                valid_hw, fused)
    dist = jnp.max(dmap)
    ws = _block_weights_all(dmap, target_distance, wfactor, width, height)
    packed = jnp.concatenate([dist[None].astype(jnp.float32),
                              ws.reshape(-1)])
    return dmap, packed


@functools.partial(jax.jit, static_argnames=("width", "height", "factors",
                                             "wfactor", "fused"))
def _compare_coeffs_fused_dyn(coeffs, pi0, target_distance, h, w,
                              width, height, factors, wfactor,
                              fused=False):
    """Bucketed fused compare: width/height static canvas dims, (h, w)
    traced true dims."""
    return _compare_coeffs_impl(coeffs, pi0, target_distance, width,
                                height, factors, wfactor,
                                valid_hw=(h, w), fused=fused)


def _block_weights_all(dmap, target_distance, wfactor, width, height):
    """All 8 weight grids (directions +1/-1 x rblock 1..4) with the
    per-block max and the Chebyshev dilations computed once and reused
    (each reduce_window is a separate launch; sharing turns ~25 of them
    into 9). Returns (8, bh, bw) in [dir+1 rb1..4, dir-1 rb1..4] order."""
    sizex = sizey = 8 * wfactor
    bw = -(-width // sizex)
    bh = -(-height // sizey)
    pad_y, pad_x = bh * sizey - height, bw * sizex - width
    dm = jnp.pad(dmap, ((0, pad_y), (0, pad_x)),
                 constant_values=-jnp.inf)
    mdpb = jnp.maximum(jax.lax.reduce_window(
        dm, -jnp.inf, jax.lax.max, (sizey, sizex), (sizey, sizex),
        "VALID"), 0.0)

    def dil3(x):
        """3x3 max-dilation over the last two axes (any leading dims)."""
        ones = (1,) * (x.ndim - 2)
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                     ones + (3, 3), ones + (1, 1), "SAME")

    # mld_rb by incremental 3x3 max-dilation; chebyshev radius rb
    mlds = []
    cur = mdpb
    for _ in range(4):
        cur = dil3(cur)
        mlds.append(jnp.maximum(cur, target_distance))

    grids = []
    for rb in range(4):
        grids.append(jnp.where((mdpb <= target_distance)
                               & (mlds[rb] <= 1.1 * target_distance),
                               1.0, 0.0))
    k_local = 0.5
    # The four trigger planes dilate TOGETHER: one batched (4, bh, bw)
    # dilation per distance step instead of 1+2+3+4 singles; plane rb
    # stops accumulating past its own radius rb+1.
    trig = jnp.stack([
        (mdpb > ((1 - k_local) * target_distance
                 + k_local * mlds[rb])).astype(dmap.dtype)
        for rb in range(4)])
    w = trig                            # d = 0 term
    t = trig
    for d in range(1, 5):
        t = dil3(t)
        live = (jnp.arange(4) >= d - 1).astype(dmap.dtype)[:, None, None]
        w = jnp.maximum(w, live * t / (d + 1.0))
    return jnp.concatenate([jnp.stack(grids), w])


@functools.partial(jax.jit, static_argnames=("width", "height", "factors",
                                              "wfactor"))
def _compare_coeffs_fused(coeffs, pi0, target_distance, width, height,
                          factors, wfactor):
    return _compare_coeffs_impl(coeffs, pi0, target_distance, width,
                                height, factors, wfactor)


def _requant_compare_impl(base, q_batch, pi0, h, w, width, height,
                          factors, fused=False):
    from guetzli_tpu.ops.quantize import quantize_nearest

    def requant(q):
        if isinstance(base, tuple):
            return tuple(quantize_nearest(base[c], q[c])
                         for c in range(3))
        return quantize_nearest(base, q[:, None, None, :])

    if fused:
        # All B candidates in ONE Pallas launch: vmapped requant+decode
        # -> (B, 3, H, W) linear RGB -> grid=(B,) metric kernel. The
        # fused gate implies a small canvas bucket, so the B-plane
        # stack is a few MB of HBM.
        from guetzli_tpu.metric.fused_pallas import (fused_diffmap_batch,
                                                     stack_pi0)
        lins = jax.vmap(lambda q: _decode_linear(
            requant(q), width, height, factors, (h, w)))(q_batch)
        nb = lins.shape[0]
        pi0b = jnp.broadcast_to(stack_pi0(pi0)[None],
                                (nb, 10, height, width))
        hs = jnp.broadcast_to(jnp.asarray(h, jnp.int32), (nb,))
        ws = jnp.broadcast_to(jnp.asarray(w, jnp.int32), (nb,))
        dms = fused_diffmap_batch(lins, pi0b, hs, ws)
        return jnp.max(dms, axis=(1, 2))

    def one(q):
        dmap = _diffmap_from_coeffs(requant(q), pi0, width, height,
                                    factors, (h, w))
        return jnp.max(dmap)

    return jax.lax.map(one, q_batch)


@functools.partial(jax.jit, static_argnames=("width", "height", "factors",
                                             "fused"))
def _requant_compare_batch_dyn(base, q_batch, pi0, h, w, width, height,
                               factors, fused=False):
    """Speculative quant-search evaluation: B candidate quant matrices
    against the device-resident dequantized base state, one device call.

    The reference evaluates quant candidates strictly one at a time
    (TryQuantMatrix, processor.cc:298-326), paying a full link round trip
    each; since the next candidate is a deterministic function of the
    current one's DistanceOK bit, the host evaluates the whole outcome
    TREE speculatively in one call (see processor.select_quant_matrix).

    base: (3, nby, nbx, 64) int32 dequantized coeffs (quant=1 state), or
    a tuple of per-comp grids for 4:2:0; q_batch: (B, 3, 64) int32
    candidates. Returns (B,) f32 distances (requantize -> decode ->
    butteraugli max; weights are not needed by the quant search)."""
    return _requant_compare_impl(base, q_batch, pi0, h, w, width, height,
                                 factors, fused)


@functools.partial(jax.jit, static_argnames=("width", "height", "factors",
                                             "fused"))
def _requant_compare_images(bases, q_batches, pi0s, hs, ws, width, height,
                            factors, fused=False):
    """Cross-image batched twin: every arg gains a leading image axis
    (same canvas bucket). The candidate axis stays a lax.map scan, so
    each device step evaluates one candidate for ALL images — the
    per-step compare is dispatch-overhead-bound, and images amortize
    it (same rationale as refine_chunk_batch)."""
    return jax.vmap(
        lambda b, q, p, h, w: _requant_compare_impl(
            b, q, p, h, w, width, height, factors, fused)
    )(bases, q_batches, pi0s, hs, ws)


@functools.partial(jax.jit, static_argnames=("width", "height", "factors",
                                              "wfactor"))
def _compare_coeffs_fused_batch(coeffs, pi0s, target_distances, width,
                                height, factors, wfactor):
    """vmapped fused compare: one device execution + one packed pull for a
    whole batch of images (batch mode's per-iteration workhorse)."""
    def one(c, p, t):
        return _compare_coeffs_impl(c, p, t, width, height, factors,
                                    wfactor)

    return jax.vmap(one)(coeffs, pi0s, target_distances)


def _unflatten_coeffs(state_flat, shapes):
    """(total,) flat device state -> tuple of (nby, nbx, 64) arrays."""
    out = []
    off = 0
    for sh in shapes:
        size = sh[0] * sh[1] * sh[2]
        out.append(jax.lax.dynamic_slice(state_flat, (off,),
                                         (size,)).reshape(sh))
        off += size
    return tuple(out)


def _delta_impl(state_flat, upd_idx, upd_val, pi0, target_distance,
                width, height, shapes, factors, wfactor):
    st = state_flat.at[upd_idx].set(upd_val)
    dmap, packed = _compare_coeffs_impl(
        _unflatten_coeffs(st, shapes), pi0, target_distance, width,
        height, factors, wfactor)
    return st, dmap, packed


@functools.partial(jax.jit, static_argnames=("width", "height", "shapes",
                                             "factors", "wfactor"),
                   donate_argnums=(0,))
def _compare_delta_fused(state_flat, upd_idx, upd_val, pi0,
                         target_distance, width, height, shapes, factors,
                         wfactor):
    """Delta-update fused compare: the coefficient state lives ON DEVICE
    (uploading ~1.4 MB/image/iteration over the tunnel was the batch-mode
    wall); each iteration ships only the changed (index, value) pairs
    (padded to a bucket with idempotent repeats of the last real pair)."""
    return _delta_impl(state_flat, upd_idx, upd_val, pi0, target_distance,
                       width, height, shapes, factors, wfactor)


@functools.partial(jax.jit, static_argnames=("width", "height", "shapes",
                                             "factors", "wfactor"),
                   donate_argnums=(0,))
def _compare_delta_fused_batch(state_flats, upd_idx, upd_val, pi0s,
                               target_distances, width, height, shapes,
                               factors, wfactor):
    def one(s, i, v, p, t):
        return _delta_impl(s, i, v, p, t, width, height, shapes, factors,
                           wfactor)

    return jax.vmap(one)(state_flats, upd_idx, upd_val, pi0s,
                         target_distances)


def _delta_bucket(k: int) -> int:
    # Coarse buckets: every (batch-size, bucket) pair is its own multi-
    # minute XLA compile on this backend, so favor few variants over tight
    # padding (1024 pairs is still only 8 KB of upload).
    b = 1024
    while b < k:
        b *= 4
    return b


DELTA_MAX = 16384   # above this, re-uploading the full state is cheaper


_UID = __import__("itertools").count()


class ButteraugliComparatorTPU(Comparator):
    """Device-resident butteraugli comparator.

    rgb: (H, W, 3) uint8 original. target_distance: quality-derived goal.
    """

    def __init__(self, rgb: np.ndarray, target_distance: float,
                 stats=None, batcher=None):
        self.uid = next(_UID)   # stable cache key for batch-mode handlers
        self.height, self.width = rgb.shape[:2]
        self.target_distance = float(target_distance)
        self.rgb_orig = np.asarray(rgb, dtype=np.uint8)
        self.stats = stats
        self.batcher = batcher  # cross-image device-call batching
        from guetzli_tpu.parallel import runtime
        self.sp_mesh = runtime.current_sp_mesh()
        if self.sp_mesh is not None and len(self.sp_mesh.devices) == 1:
            self.sp_mesh = None
        self.fused = False
        if _BUCKETS:
            self.hb = bucket_dim(self.height)
            self.wb = bucket_dim(self.width)
            if self.sp_mesh is None:
                from guetzli_tpu.metric.fused_pallas import (
                    fused_metric_eligible)
                self.fused = fused_metric_eligible(self.hb, self.wb)
            pad = np.zeros((self.hb, self.wb, 3), dtype=np.uint8)
            pad[:self.height, :self.width] = self.rgb_orig
            pad_dev = jnp.asarray(pad.transpose(2, 0, 1))
            if self.sp_mesh is not None:
                # sp: image rows sharded over the worker's submesh; GSPMD
                # partitions the metric pipeline (halo exchanges + pmax)
                pad_dev = runtime.shard_rows(pad_dev, self.sp_mesh, 1)
            lin, self._xyb0, self._pi0 = _precompute_pi0_u8(
                pad_dev, jnp.int32(self.height), jnp.int32(self.width))
            if self.fused:
                # One-time hardware self-test per bucket: a Pallas
                # failure (VMEM overflow on an untried canvas) degrades
                # to the XLA metric path instead of killing the encode.
                from guetzli_tpu.metric.fused_pallas import probe_fused
                self.fused = probe_fused(lin, self._pi0,
                                         self.height, self.width)
        else:
            self.hb, self.wb = self.height, self.width
            lin = srgb8_to_linear(jnp.asarray(rgb.transpose(2, 0, 1)))
            self._xyb0 = _opsin_from_linear(lin)
            self._pi0 = separate_frequencies(self._xyb0)
        self._distmap: Optional[jax.Array] = None
        self.distance = 0.0
        self._mask_xyz: Optional[jax.Array] = None

    def pad_comp_grid(self, coeffs: np.ndarray, factor: int) -> np.ndarray:
        """(nby, nbx, 64) true component grid -> bucket-canvas grid
        (hb/8f, wb/8f) with zero pad blocks."""
        nbyb = self.hb // (8 * factor)
        nbxb = self.wb // (8 * factor)
        out = np.zeros((nbyb, nbxb, 64), dtype=np.int32)
        out[:coeffs.shape[0], :coeffs.shape[1]] = coeffs
        return out

    # --- full-image path ---

    def compare(self, img) -> None:
        """img: OutputImage. Runs the full diffmap on device."""
        if _BUCKETS:
            # reuse the bucketed fused executable (weights discarded)
            self.compare_coeffs([c.coeffs for c in img.components],
                                [c.factor_x for c in img.components],
                                1, 1.0)
            return
        lin1 = img.to_linear_rgb()
        dmap, dist = _full_diffmap(self._pi0, _opsin_from_linear(lin1))
        self._distmap = dmap
        self.distance = check_finite_distance(float(dist),
                                              "compare (full diffmap)")
        if self.stats is not None and self.stats.debug:
            from guetzli_tpu.config import print_debug
            print_debug(self.stats, f" BA D[{self.distance:.4f}]\n")

    def compare_coeffs(self, coeff_list, factors, wfactor: int,
                       target_mul: float) -> np.ndarray:
        """Fused per-iteration comparison from the host coefficient mirror.

        Sets self.distance/self._distmap and returns the block-error weight
        grids as (2, 4, nby_w, nbx_w): [direction(+1,-1), rblock-1]."""
        return self.compare_coeffs_async(coeff_list, factors, wfactor,
                                         target_mul)()

    def compare_coeffs_async(self, coeff_list, factors, wfactor: int,
                             target_mul: float):
        """Dispatches the fused compare and returns a finalizer; the
        device executes while the caller does host work (e.g. the quant
        search's serialization). Calling the finalizer blocks on the one
        packed pull, sets distance/distmap, and returns the weight
        grids."""
        if _BUCKETS:
            padded = [self.pad_comp_grid(np.asarray(c), f)
                      for c, f in zip(coeff_list, factors)]
            if all(p.shape == padded[0].shape for p in padded[1:]):
                coeffs = jnp.asarray(np.stack(padded))
                if self.sp_mesh is not None:
                    from guetzli_tpu.parallel import runtime
                    coeffs = runtime.shard_rows(coeffs, self.sp_mesh, 1)
            else:
                coeffs = tuple(jnp.asarray(p) for p in padded)
                if self.sp_mesh is not None:
                    from guetzli_tpu.parallel import runtime
                    coeffs = tuple(
                        runtime.shard_rows(c, self.sp_mesh, 0)
                        for c in coeffs)
            dmap, packed = _compare_coeffs_fused_dyn(
                coeffs, self._pi0,
                jnp.float32(self.target_distance * target_mul),
                jnp.int32(self.height), jnp.int32(self.width),
                self.wb, self.hb, tuple(factors), int(wfactor),
                fused=self.fused)

            def finalize():
                self._distmap = dmap
                host = np.asarray(packed)
                self.distance = check_finite_distance(
                    float(host[0]), "compare_coeffs (bucketed fused)")
                if self.stats is not None and self.stats.debug:
                    from guetzli_tpu.config import print_debug
                    print_debug(self.stats,
                                f" BA D[{self.distance:.4f}]\n")
                bwc = self.wb // (8 * wfactor)
                bhc = self.hb // (8 * wfactor)
                bw = -(-self.width // (8 * wfactor))
                bh = -(-self.height // (8 * wfactor))
                return host[1:].reshape(8, bhc, bwc)[:, :bh, :bw].reshape(
                    2, 4, bh, bw)

            return finalize
        return lambda: self._compare_coeffs_sync(coeff_list, factors,
                                                 wfactor, target_mul)

    # --- speculative quant-search evaluation ---

    def quant_search_begin(self, coeff_list, factors) -> None:
        """Uploads the dequantized base state once; compare_requant_batch
        then ships only the (B, 3, 64) candidate matrices per call."""
        from guetzli_tpu.parallel import runtime
        padded = [self.pad_comp_grid(np.ascontiguousarray(c, np.int32), f)
                  for c, f in zip(coeff_list, factors)]
        self._qs_factors = tuple(int(f) for f in factors)
        if all(p.shape == padded[0].shape for p in padded[1:]):
            base = jnp.asarray(np.stack(padded))
            if self.sp_mesh is not None:
                base = runtime.shard_rows(base, self.sp_mesh, 1)
        else:
            base = tuple(jnp.asarray(p) for p in padded)
            if self.sp_mesh is not None:
                base = tuple(runtime.shard_rows(p, self.sp_mesh, 0)
                             for p in base)
        self._qs_base = base

    def _fused_path_failed(self, e: Exception, context: str) -> None:
        """Last-resort degrade: a fused-metric failure that escaped the
        probe (untried batch shape / Mosaic regression) must never kill
        the encode — the reference always produces output
        (processor.cc:828-846). Marks the bucket broken (process-wide,
        so every comparator of it makes the same choice from now on)
        and flips this comparator to the XLA metric path."""
        import sys
        from guetzli_tpu.metric import fused_pallas
        fused_pallas.mark_bucket_broken(self.hb, self.wb)
        self.fused = False
        detail = " ".join(str(e).split())[:1200]
        print(f"guetzli_tpu: fused metric path failed in {context} at "
              f"bucket {(self.hb, self.wb)} ({type(e).__name__}); "
              f"degrading to the XLA metric path\n  detail: {detail}",
              file=sys.stderr)

    def compare_requant_batch(self, q_batch: np.ndarray) -> np.ndarray:
        """(B, 3, 64) int32 candidate quant matrices -> (B,) distances of
        the requantized base state (one fused device call; in batch mode
        same-bucket images' quant searches coalesce cross-image)."""
        if getattr(self, "batcher", None) is not None \
                and self.sp_mesh is None:
            return self.batcher.submit("requant", {
                "base": self._qs_base,
                "q": np.asarray(q_batch, np.int32),
                "pi0": self._pi0, "uid": self.uid,
                "h": self.height, "w": self.width,
                "wb": self.wb, "hb": self.hb,
                "factors": self._qs_factors, "fused": self.fused})
        try:
            # The device->host transfer stays INSIDE the try: on an async
            # backend a fused-kernel execution error only surfaces at
            # materialization, and it must degrade, not kill the encode.
            host = np.asarray(_requant_compare_batch_dyn(
                self._qs_base, jnp.asarray(q_batch, jnp.int32), self._pi0,
                jnp.int32(self.height), jnp.int32(self.width),
                self.wb, self.hb, self._qs_factors, fused=self.fused))
        except Exception as e:              # noqa: BLE001
            if not self.fused:
                raise
            self._fused_path_failed(e, "compare_requant_batch")
            host = np.asarray(_requant_compare_batch_dyn(
                self._qs_base, jnp.asarray(q_batch, jnp.int32), self._pi0,
                jnp.int32(self.height), jnp.int32(self.width),
                self.wb, self.hb, self._qs_factors, fused=False))
        return check_finite_distance(host, "compare_requant_batch")

    def _compare_coeffs_sync(self, coeff_list, factors, wfactor: int,
                             target_mul: float) -> np.ndarray:
        """Legacy (unbucketed / batcher) fused compare, blocking."""
        if self.batcher is not None:
            dist, dmap, w = self.batcher.submit("fused", {
                "coeffs": [np.ascontiguousarray(c) for c in coeff_list],
                "pi0": self._pi0, "uid": self.uid,
                "target": self.target_distance * target_mul,
                "width": self.width, "height": self.height,
                "factors": tuple(factors), "wfactor": int(wfactor),
            })
            self._distmap = dmap
            self.distance = dist
            if self.stats is not None and self.stats.debug:
                print(f" BA D[{self.distance:.4f}]")
            return w
        if all(c.shape == coeff_list[0].shape for c in coeff_list[1:]):
            coeffs = jnp.asarray(np.stack(coeff_list))  # single transfer
        else:
            coeffs = tuple(jnp.asarray(np.ascontiguousarray(c)) for c in
                           coeff_list)
        dmap, packed = _compare_coeffs_fused(
            coeffs, self._pi0,
            jnp.float32(self.target_distance * target_mul),
            self.width, self.height, tuple(factors), wfactor)
        self._distmap = dmap
        host = np.asarray(packed)
        self.distance = check_finite_distance(
            float(host[0]), "compare_coeffs (legacy fused)")
        if self.stats is not None and self.stats.debug:
            from guetzli_tpu.config import print_debug
            print_debug(self.stats, f" BA D[{self.distance:.4f}]\n")
        bw = -(-self.width // (8 * wfactor))
        bh = -(-self.height // (8 * wfactor))
        return host[1:].reshape(2, 4, bh, bw)

    # --- device-resident coefficient state + delta compare ---

    def reset_coeff_state(self, coeff_list, factors) -> None:
        """Uploads the full coefficient state once; compare_delta then
        mutates the device copy with scatters (tunnel traffic per
        iteration drops from megabytes to the changed pairs)."""
        self._state_shapes = tuple(tuple(c.shape) for c in coeff_list)
        self._state_factors = tuple(int(f) for f in factors)
        flat = np.concatenate([np.ascontiguousarray(c, dtype=np.int32)
                               .ravel() for c in coeff_list])
        self._state_offsets = np.concatenate(
            [[0], np.cumsum([c.size for c in coeff_list])])
        self._state_flat = jnp.asarray(flat)

    def flat_index(self, comp: int, block: int, k: int):
        """Flat index of (component, block-in-grid, coeff) in the device
        state (vectorized over numpy inputs)."""
        return (self._state_offsets[comp] + block * 64 + k).astype(np.int64)

    def verify_device_state(self, coeff_list) -> None:
        """Paranoid check (GUETZLI_TPU_PARANOID=1): the device-resident
        coefficient state must equal the host mirror after every delta
        scatter — guards against backend scatter miscompiles (one already
        found in the vmapped zeroing loop; see the verify skill notes)."""
        expect = np.concatenate([np.ascontiguousarray(c, dtype=np.int32)
                                 .ravel() for c in coeff_list])
        got = np.asarray(self._state_flat)
        if not np.array_equal(expect, got):
            bad = int(np.sum(expect != got))
            raise AssertionError(
                f"device coefficient state desynced: {bad} entries differ")

    def compare_delta(self, upd_idx: np.ndarray, upd_val: np.ndarray,
                      wfactor: int, target_mul: float) -> np.ndarray:
        """Fused compare against the device state after applying the given
        flat-index updates. Same contract as compare_coeffs."""
        k = len(upd_idx)
        if k == 0:
            raise ValueError("compare_delta requires at least one update")
        bucket = _delta_bucket(k)
        idx = np.concatenate([upd_idx,
                              np.full(bucket - k, upd_idx[-1],
                                      upd_idx.dtype)]).astype(np.int32)
        val = np.concatenate([upd_val,
                              np.full(bucket - k, upd_val[-1],
                                      upd_val.dtype)]).astype(np.int32)
        if self.batcher is not None:
            dist, dmap, w, new_state = self.batcher.submit("delta", {
                "state": self._state_flat, "idx": idx, "val": val,
                "pi0": self._pi0, "uid": self.uid,
                "target": self.target_distance * target_mul,
                "width": self.width, "height": self.height,
                "shapes": self._state_shapes,
                "factors": self._state_factors, "wfactor": int(wfactor),
            })
            self._state_flat = new_state
            self._distmap = dmap
            self.distance = dist
            if self.stats is not None and self.stats.debug:
                print(f" BA D[{self.distance:.4f}]")
            return w
        st, dmap, packed = _compare_delta_fused(
            self._state_flat, jnp.asarray(idx), jnp.asarray(val),
            self._pi0, jnp.float32(self.target_distance * target_mul),
            self.width, self.height, self._state_shapes,
            self._state_factors, int(wfactor))
        self._state_flat = st
        self._distmap = dmap
        host = np.asarray(packed)
        self.distance = check_finite_distance(
            float(host[0]), "compare_delta")
        if self.stats is not None and self.stats.debug:
            from guetzli_tpu.config import print_debug
            print_debug(self.stats, f" BA D[{self.distance:.4f}]\n")
        bw = -(-self.width // (8 * wfactor))
        bh = -(-self.height // (8 * wfactor))
        return host[1:].reshape(2, 4, bh, bw)

    def distance_ok(self, target_mul: float) -> bool:
        return self.distance <= target_mul * self.target_distance

    def distmap(self) -> jax.Array:
        if self._distmap is None:
            return jnp.zeros((self.height, self.width), jnp.float32)
        return self._distmap[:self.height, :self.width]

    def score_output_size(self, size: int) -> float:
        return score_jpeg(self.distance, size, self.target_distance)

    def block_error_limit(self) -> float:
        return self.target_distance

    # --- block-comparison path (batched) ---

    def start_block_comparisons(self) -> None:
        """Precompute the self-masking field (reference
        StartBlockComparisons: Mask(opsin0, opsin0))."""
        if _BUCKETS:
            m, _ = _mask_self_dyn(self._xyb0, jnp.int32(self.height),
                                  jnp.int32(self.width))
        else:
            m, _ = mask_fn(self._xyb0, self._xyb0)
        self._mask_xyz = m  # (3, H, W)

    def finish_block_comparisons(self) -> None:
        self._mask_xyz = None

    def corner_masks(self) -> jax.Array:
        """(nby, nbx, 3) mask values at each full-resolution 8x8 block
        corner — what CompareBlock reads at (8*block_y, 8*block_x); true
        image grid (bucket pad sliced off)."""
        assert self._mask_xyz is not None, "call start_block_comparisons"
        nby, nbx = -(-self.height // 8), -(-self.width // 8)
        m = self._mask_xyz[:, ::8, ::8][:, :nby, :nbx]
        return jnp.transpose(m, (1, 2, 0))

    def original_block_opsin(self, factor: int = 1) -> jax.Array:
        """(nby, nbx, 3, 8, 8) per-8x8-tile opsin of the original image,
        edge-replicated to the block grid (reference SwitchBlock
        semantics, batched over every block)."""
        h, w = self.height, self.width
        nby, nbx = -(-h // 8), -(-w // 8)
        pad = np.pad(self.rgb_orig,
                     ((0, nby * 8 - h), (0, nbx * 8 - w), (0, 0)),
                     mode="edge")
        return _block_opsin_u8(jnp.asarray(pad.transpose(2, 0, 1)))
