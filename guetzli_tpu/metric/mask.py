"""Visual masking.

Reference: third_party/butteraugli/butteraugli.cc:1638-1817 (MakeMask LUTs,
DiffPrecompute, Mask). Produces per-channel AC and DC mask planes from the
combined uhf+hf activity of both images.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from guetzli_tpu.ops.blur import blur_multi

GLOBAL_SCALE = 1.0 / 20.35  # kGlobalScale (butteraugli.cc:138-139)


@functools.lru_cache(maxsize=8)
def _mask_lut(extmul: float, extoff: float, mul: float, offset: float,
              scaler: float) -> np.ndarray:
    i = np.arange(512, dtype=np.float64)
    c = mul / ((0.01 * scaler * i) + offset)
    lut = GLOBAL_SCALE * (1.0 + extmul * (c + extoff))
    lut = np.maximum(lut, 1e-5)
    return (lut * lut).astype(np.float32)


MASK_X_PARAMS = (2.59885507073, 3.08805636789, 5.62939030582,
                 0.315424196682, 16.2770141832)
MASK_Y_PARAMS = (0.9613705131, -0.581933100068, 6.64307621174,
                 1.00846207765, 2.2342321176)
MASK_DC_X_PARAMS = (10.0470705878, 3.18472654033, 0.373092999662,
                    0.0551512255218, 70.0)
MASK_DC_Y_PARAMS = (0.0115640939227, 45.9483175519, 2.52611324247,
                    0.0142290066313, 5.0)


def _interpolate_clamp_negative(lut: np.ndarray, ix: jax.Array) -> jax.Array:
    """Linear interpolation into a 512-entry LUT, clamped at both ends
    (reference butteraugli.cc:236-251)."""
    table = jnp.asarray(lut)
    ix = jnp.maximum(ix, 0.0)
    base = jnp.minimum(jnp.floor(ix), len(lut) - 1 - 1e-9).astype(jnp.int32)
    base = jnp.minimum(base, len(lut) - 2)
    mix = ix - base.astype(ix.dtype)
    lo = table[base]
    hi = table[base + 1]
    at_end = ix >= len(lut) - 1
    return jnp.where(at_end, table[len(lut) - 1], lo + mix * (hi - lo))


def _mask_curve(k: jax.Array, params) -> jax.Array:
    """The analytic function the reference samples into its 512-entry mask
    LUTs (butteraugli.cc:1638-1696): evaluated directly at (float) index k
    — no gather, identical values."""
    extmul, extoff, mul, offset, scaler = params
    c = mul / (0.01 * scaler * k + offset)
    v = GLOBAL_SCALE * (1.0 + extmul * (c + extoff))
    v = jnp.maximum(v, 1e-5)
    return v * v


def _interp_analytic(params, ix: jax.Array) -> jax.Array:
    """LUT-lerp semantics (floor/clamp exactly as InterpolateClampNegative)
    with the table values computed analytically per element — TPU gathers
    serialize, arithmetic doesn't."""
    ix = jnp.maximum(ix, 0.0)
    base = jnp.minimum(jnp.floor(ix), 510.0)
    mix = ix - base
    lo = _mask_curve(base, params)
    hi = _mask_curve(base + 1.0, params)
    at_end = ix >= 511.0
    return jnp.where(at_end, _mask_curve(jnp.full_like(ix, 511.0), params),
                     lo + mix * (hi - lo))


def mask_x(delta):
    return _interp_analytic(MASK_X_PARAMS, delta)


def mask_y(delta):
    return _interp_analytic(MASK_Y_PARAMS, delta)


def mask_dc_x(delta):
    return _interp_analytic(MASK_DC_X_PARAMS, delta)


def mask_dc_y(delta):
    return _interp_analytic(MASK_DC_Y_PARAMS, delta)


def diff_precompute(p0: jax.Array, p1: jax.Array,
                    valid_hw=None) -> jax.Array:
    """Local gradient magnitude min of the two images, clamped
    (reference butteraugli.cc:1699-1739). (H, W) planes. With valid_hw,
    the far-edge backward step lands at the TRUE edge (h-1, w-1) inside
    the padded canvas."""
    def grad(p):
        # |p(x,y) - p(x2,y)| + |p(x,y) - p(x,y2)| where x2/y2 step forward,
        # or backward at the far edge (or stay at 0 for size-1 axes).
        if valid_hw is None:
            right = jnp.concatenate([p[:, 1:], p[:, -2:-1]], axis=1) \
                if p.shape[1] > 1 else p
            down = jnp.concatenate([p[1:, :], p[-2:-1, :]], axis=0) \
                if p.shape[0] > 1 else p
        else:
            h, w = valid_hw
            fwd = jnp.concatenate([p[:, 1:], p[:, -1:]], axis=1)
            bwd = jnp.concatenate([p[:, :1], p[:, :-1]], axis=1)
            col = jnp.arange(p.shape[1])[None, :]
            right = jnp.where(col == w - 1, bwd, fwd)
            fwd = jnp.concatenate([p[1:, :], p[-1:, :]], axis=0)
            bwd = jnp.concatenate([p[:1, :], p[:-1, :]], axis=0)
            row = jnp.arange(p.shape[0])[:, None]
            down = jnp.where(row == h - 1, bwd, fwd)
        return jnp.abs(p - right) + jnp.abs(p - down)

    mul0 = 0.918416534734
    cutoff = 55.0184555849
    out = mul0 * jnp.minimum(grad(p0), grad(p1))
    return jnp.minimum(out, cutoff)


MASK_R0 = 2.3770330432
MASK_R1 = 9.04353323561
MASK_R2 = 9.24456601467
MASK_BORDER_RATIO = -0.0724948220913
MASK_BLUR_SPECS = ((MASK_R2, MASK_BORDER_RATIO), (MASK_R0, MASK_BORDER_RATIO),
                   (MASK_R1, MASK_BORDER_RATIO))


def mask(mask_xyb0: jax.Array, mask_xyb1: jax.Array, valid_hw=None):
    """(>=2, H, W) activity images (only X=0, Y=1 used) -> (mask, mask_dc),
    each (3, H, W)."""
    diff_x = diff_precompute(mask_xyb0[0], mask_xyb1[0], valid_hw)
    diff_y = diff_precompute(mask_xyb0[1], mask_xyb1[1], valid_hw)
    # One batched multi-sigma blur for the three mask passes.
    blurred = blur_multi(jnp.stack([diff_x, diff_y, diff_y]),
                         MASK_BLUR_SPECS, valid_hw)
    return mask_from_blurred(blurred[0], blurred[1], blurred[2])


def mask_from_blurred(b_r2: jax.Array, b_r0: jax.Array, b_r1: jax.Array):
    """The post-blur mask math; split out so callers can batch the three
    mask blurs with other same-stage blurs (reference butteraugli.cc:
    1741-1817 after the Blur() calls)."""
    muls0 = 0.207017089891
    muls1 = 0.267138152891
    normalizer = 1.0 / (muls0 + muls1)
    s0 = b_r2
    s1 = normalizer * (muls0 * b_r0 + muls1 * b_r1)

    mul0 = 16.6963293877
    mul1 = 2.1364621982
    w00 = 36.4671237619
    w11 = 2.1887170895
    w_ytob_hf = 0.086624184478
    w_ytob_lf = 21.6804277046
    p1_to_p0 = 0.0513061271723

    p1 = mul1 * w11 * s1
    p0 = mul0 * w00 * s0 + p1_to_p0 * p1

    m_x = mask_x(p0)
    m_y = mask_y(p1)
    md_x = mask_dc_x(p0)
    md_y = mask_dc_y(p1)
    out_mask = jnp.stack([m_x, m_y, w_ytob_hf * m_y])
    out_mask_dc = jnp.stack([md_x, md_y, w_ytob_lf * md_y])
    return out_mask, out_mask_dc


def mask_activity_planes(pi0, pi1):
    """Combine uhf+hf into the two activity images
    (reference butteraugli.cc:753-782). Only X and Y planes are produced
    (the B plane is identically zero and unused by mask())."""
    muls = (0.0, 1.64178305129, 0.831081703362, 3.23680933546)
    act0 = jnp.stack([
        muls[0] * pi0.uhf[0] + muls[1] * pi0.hf[0],
        muls[2] * pi0.uhf[1] + muls[3] * pi0.hf[1],
    ])
    act1 = jnp.stack([
        muls[0] * pi1.uhf[0] + muls[1] * pi1.hf[0],
        muls[2] * pi1.uhf[1] + muls[3] * pi1.hf[1],
    ])
    return act0, act1


def mask_psycho_image(pi0, pi1, valid_hw=None):
    """Activity images -> (mask, mask_dc) (reference butteraugli.cc:753-782)."""
    act0, act1 = mask_activity_planes(pi0, pi1)
    return mask(act0, act1, valid_hw)
