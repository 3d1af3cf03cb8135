"""Full butteraugli diffmap pipeline.

Reference: third_party/butteraugli/butteraugli.cc:624-908 (diff channels,
DiffmapPsychoImage) and :1819-1858 (small-image border extension). Pure
jittable functions over (3, H, W) float planes; the original image's
PsychoImage is computed once and reused across candidate comparisons.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from guetzli_tpu.metric import malta
from guetzli_tpu.metric import mask as mask_mod
from guetzli_tpu.metric.frequencies import PsychoImage, separate_frequencies
from guetzli_tpu.metric.mask import mask_activity_planes
from guetzli_tpu.metric.opsin import opsin_dynamics_image
from guetzli_tpu.ops.blur import blur, blur_multi

HF_ASYMMETRY = 0.8


def same_noise_levels(i0, i1, sigma, w, maxclamp, valid_hw=None):
    v0 = jnp.minimum(jnp.abs(i0), maxclamp)
    v1 = jnp.minimum(jnp.abs(i1), maxclamp)
    diff = blur(v0 - v1, sigma, 0.0, valid_hw)
    return w * diff * diff


def l2_diff(i0, i1, w):
    d = i0 - i1
    return w * d * d


def l2_diff_asymmetric(i0, i1, w_0gt1, w_0lt1):
    w_0gt1 = w_0gt1 * 0.8
    w_0lt1 = w_0lt1 * 0.8
    d = i0 - i1
    out = w_0gt1 * d * d
    fabs0 = jnp.abs(i0)
    too_small = 0.4 * fabs0
    too_big = 1.0 * fabs0
    neg = jnp.where(i1 > -too_small, i1 + too_small,
                    jnp.where(i1 < -too_big, -i1 - too_big, 0.0))
    pos = jnp.where(i1 < too_small, too_small - i1,
                    jnp.where(i1 > too_big, i1 - too_big, 0.0))
    v = jnp.where(i0 < 0, neg, pos)
    return out + w_0lt1 * v * v


def calculate_diffmap(diffmap_in: jax.Array, valid_hw=None) -> jax.Array:
    """sqrt + neighborhood mixing (reference butteraugli.cc:718-751)."""
    k_initial_slope = 100.0
    d = jnp.where(diffmap_in < 1.0 / (k_initial_slope * k_initial_slope),
                  k_initial_slope * diffmap_in,
                  jnp.sqrt(jnp.maximum(diffmap_in, 0.0)))
    sigma = 1.72547472444
    mul1 = 0.458794906198
    scale = 1.0 / (1.0 + mul1)
    return (d + mul1 * blur(d, sigma, 1.0, valid_hw)) * scale


def diffmap_psycho_image(pi0: PsychoImage, pi1: PsychoImage,
                         valid_hw=None) -> jax.Array:
    """The per-channel distortion accumulation + masking + combination.

    valid_hw: optional traced (h, w) when the planes live in a padded
    size-bucket canvas. The Malta stencils use zero-pad border semantics
    (matching the reference), so their inputs are masked to zero outside
    the valid region; every blur masks internally; pointwise garbage in
    the pad stays in the pad and the caller masks the final map."""
    ha = HF_ASYMMETRY
    sqrt_ha = jnp.sqrt(jnp.asarray(ha)).item() if False else float(ha) ** 0.5

    if valid_hw is not None:
        h, w = valid_hw
        hs, ws = pi0.lf.shape[-2], pi0.lf.shape[-1]
        vmask = ((jnp.arange(hs) < h)[:, None]
                 & (jnp.arange(ws) < w)[None, :])
    else:
        vmask = None

    def masked(x):
        return x if vmask is None else jnp.where(vmask, x, 0.0)

    ac0 = jnp.zeros_like(pi0.lf[0])
    ac1 = jnp.zeros_like(ac0)
    ac2 = jnp.zeros_like(ac0)
    dc = [jnp.zeros_like(ac0) for _ in range(3)]

    # Malta stages (weights/norms from butteraugli.cc:831-871). All six
    # scaled-diff planes go through TWO batched stencil convs (the conv is
    # launch-overhead-bound, not FLOP-bound, on small images).
    MULLI = 0.354191303559
    MULLI_LF = 0.405371989604
    d_nonlf = masked(jnp.stack([
        malta.malta_scaled_diffs(pi0.uhf[1], pi1.uhf[1],
                                 5.1409625726 * ha, 5.1409625726 / ha,
                                 58.5001247061, mulli=MULLI),
        malta.malta_scaled_diffs(pi0.uhf[0], pi1.uhf[0],
                                 4.91743441556 * ha, 4.91743441556 / ha,
                                 687196.39002, mulli=MULLI),
    ]))
    d_lf = masked(jnp.stack([
        malta.malta_scaled_diffs(pi0.hf[1], pi1.hf[1],
                                 153.671655716 * sqrt_ha,
                                 153.671655716 / sqrt_ha,
                                 83150785.9592, mulli=MULLI_LF),
        malta.malta_scaled_diffs(pi0.hf[0], pi1.hf[0],
                                 668.358918152 * sqrt_ha,
                                 668.358918152 / sqrt_ha,
                                 0.882954368025, mulli=MULLI_LF),
        malta.malta_scaled_diffs(pi0.mf[1], pi1.mf[1], 6841.81248144,
                                 6841.81248144, 0.0135134962487,
                                 mulli=MULLI_LF),
        malta.malta_scaled_diffs(pi0.mf[0], pi1.mf[0], 813.901703816,
                                 813.901703816, 16792.9322251,
                                 mulli=MULLI_LF),
    ]))
    s_nonlf = malta.malta_sum_of_squares_batch(d_nonlf, lf=False)
    s_lf = malta.malta_sum_of_squares_batch(d_lf, lf=True)
    ac1 = ac1 + s_nonlf[0] + s_lf[0] + s_lf[2]
    ac0 = ac0 + s_nonlf[1] + s_lf[1] + s_lf[3]

    wmul = (0.0, 32.4449876135, 0.0, 0.0, 0.0, 0.0,
            1.01370836411, 0.0, 1.74566011615)

    # The SameNoiseLevels blur (sigma 10.67) and the three mask blurs
    # (r0/r1/r2) are all independent given hf/uhf: batch the four into ONE
    # multi-sigma matmul blur (reference runs them as separate Blur()s,
    # butteraugli.cc:888, :1757-1759).
    snl_sigma, snl_w, snl_maxclamp = 10.6666499623, 884.809801415, \
        85.7047444518
    v0 = jnp.minimum(jnp.abs(pi0.hf[1]), snl_maxclamp)
    v1 = jnp.minimum(jnp.abs(pi1.hf[1]), snl_maxclamp)
    act0, act1 = mask_activity_planes(pi0, pi1)
    diff_x = mask_mod.diff_precompute(act0[0], act1[0], valid_hw)
    diff_y = mask_mod.diff_precompute(act0[1], act1[1], valid_hw)
    blurred4 = blur_multi(
        jnp.stack([v0 - v1, diff_x, diff_y, diff_y]),
        ((snl_sigma, 0.0),) + mask_mod.MASK_BLUR_SPECS, valid_hw)
    snl_diff = blurred4[0]
    ac1 = ac1 + snl_w * snl_diff * snl_diff

    # L2 terms.
    ac0 = ac0 + l2_diff_asymmetric(pi0.hf[0], pi1.hf[0], wmul[0] * ha,
                                   wmul[0] / ha)
    ac1 = ac1 + l2_diff_asymmetric(pi0.hf[1], pi1.hf[1], wmul[1] * ha,
                                   wmul[1] / ha)
    ac0 = ac0 + l2_diff(pi0.mf[0], pi1.mf[0], wmul[3])
    ac1 = ac1 + l2_diff(pi0.mf[1], pi1.mf[1], wmul[4])
    ac2 = ac2 + l2_diff(pi0.mf[2], pi1.mf[2], wmul[5])
    dc[0] = dc[0] + l2_diff(pi0.lf[0], pi1.lf[0], wmul[6])
    dc[1] = dc[1] + l2_diff(pi0.lf[1], pi1.lf[1], wmul[7])
    dc[2] = dc[2] + l2_diff(pi0.lf[2], pi1.lf[2], wmul[8])

    mask_ac, mask_dc = mask_mod.mask_from_blurred(
        blurred4[1], blurred4[2], blurred4[3])

    combined = (mask_dc[0] * dc[0] + mask_dc[1] * dc[1] + mask_dc[2] * dc[2]
                + mask_ac[0] * ac0 + mask_ac[1] * ac1 + mask_ac[2] * ac2)
    return masked(calculate_diffmap(masked(combined), valid_hw))


def _extend_border(plane: jax.Array, xborder: int, yborder: int,
                   xscaled: int, yscaled: int) -> jax.Array:
    """Edge-replicated extension used for <8px images
    (reference butteraugli.cc:1819-1858)."""
    h, w = plane.shape[-2:]
    ys = jnp.clip(jnp.arange(yscaled) - yborder, 0, h - 1)
    xs = jnp.clip(jnp.arange(xscaled) - xborder, 0, w - 1)
    return plane[..., ys, :][..., :, xs]


def butteraugli_diffmap(rgb0: jax.Array, rgb1: jax.Array) -> jax.Array:
    """(3, H, W) linear-RGB pairs -> (H, W) diffmap. Small images (<8px on
    a side) are border-extended first, as in the reference."""
    h, w = rgb0.shape[-2:]
    if h < 8 or w < 8:
        xborder = (8 - w) // 2 if w < 8 else 0
        yborder = (8 - h) // 2 if h < 8 else 0
        xs, ys = max(8, w), max(8, h)
        d = butteraugli_diffmap(_extend_border(rgb0, xborder, yborder, xs, ys),
                                _extend_border(rgb1, xborder, yborder, xs, ys))
        return d[yborder:yborder + h, xborder:xborder + w]
    pi0 = separate_frequencies(opsin_dynamics_image(rgb0))
    pi1 = separate_frequencies(opsin_dynamics_image(rgb1))
    return diffmap_psycho_image(pi0, pi1)


def score_from_diffmap(diffmap: jax.Array) -> jax.Array:
    return jnp.max(diffmap)


def butteraugli_distance(rgb0: jax.Array, rgb1: jax.Array) -> jax.Array:
    return score_from_diffmap(butteraugli_diffmap(rgb0, rgb1))
