"""Frequency separation of the XYB opsin image.

Reference: third_party/butteraugli/butteraugli.cc:489-622
(SeparateFrequencies + helpers). Produces the PsychoImage planes:
  lf (3: XYB, already mapped to 'vals' space), mf (3), hf (2: XY),
  uhf (2: XY).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from guetzli_tpu.ops.blur import blur

SIGMA_LF = 7.46953768697
SIGMA_HF = SIGMA_LF / 2.0
SIGMA_UHF = SIGMA_LF / 4.0
BORDER_LF = -0.00457628248637
BORDER_MF = -0.271277366628
BORDER_HF = 0.147068973249


class PsychoImage(NamedTuple):
    lf: jax.Array   # (3, H, W)
    mf: jax.Array   # (3, H, W)
    hf: jax.Array   # (2, H, W)
    uhf: jax.Array  # (2, H, W)


def remove_range_around_zero(w: float, x: jax.Array) -> jax.Array:
    return jnp.where(x > w, x - w, jnp.where(x < -w, x + w, 0.0))


def amplify_range_around_zero(w: float, x: jax.Array) -> jax.Array:
    return jnp.where(x > w, x + w, jnp.where(x < -w, x - w, 2.0 * x))


def maximum_clamp(v: jax.Array, maxval: float) -> jax.Array:
    mul = 0.688059627878
    return jnp.where(
        v >= maxval, (v - maxval) * mul + maxval,
        jnp.where(v < -maxval, (v + maxval) * mul - maxval, v))


def suppress_x_by_y(x: jax.Array, y: jax.Array, yw: float) -> jax.Array:
    s = 0.745954517135
    scaler = s + (yw * (1.0 - s)) / (yw + y * y)
    return scaler * x


def _suppress_in_bright(hf: jax.Array, brightness: jax.Array,
                        mul: float, reg: float) -> jax.Array:
    return mul * reg / (reg + brightness) * hf


def xyb_lowfreq_to_vals(x, y, b):
    xmul = 5.57547552483
    ymul = 1.20828034498
    bmul = 6.08319517575
    y_to_b_mul = -0.628811683685
    return x * xmul, y * ymul, (b + y_to_b_mul * y) * bmul


def separate_frequencies(xyb: jax.Array, valid_hw=None) -> PsychoImage:
    """(3, H, W) XYB -> PsychoImage. Mirrors the reference cascade exactly:
    lf = blur(sigma_lf); mf = blur(residual, sigma_hf) with per-channel
    zero-range shaping; hf = blur(residual, sigma_uhf); uhf = residual, with
    clamping/brightness suppression on Y."""
    lf = blur(xyb, SIGMA_LF, BORDER_LF, valid_hw)
    res = xyb - lf

    # One batched (3, H, W) blur instead of three per-plane calls.
    mf_blur = blur(res, SIGMA_HF, BORDER_MF, valid_hw)
    mf_x_blur, mf_y_blur, mf_b = mf_blur[0], mf_blur[1], mf_blur[2]
    hf_x = res[0] - mf_x_blur
    hf_y = res[1] - mf_y_blur
    w0 = 0.120079806822
    w1 = 0.03430529365
    mf_x = remove_range_around_zero(w0, mf_x_blur)
    mf_y = amplify_range_around_zero(w1, mf_y_blur)

    # Suppress red-green by intensity change in the high freq channels.
    hf_x = suppress_x_by_y(hf_x, hf_y, 2.96534974403)

    k_remove_hf = 0.0287615200377
    k_maxclamp_hf = 78.8223237675
    k_maxclamp_uhf = 5.8907152736
    k_mul_s_hf = 1.10684769012
    k_reg_hf = 2000 * 0.478741530298
    k_mul_s_uhf = 1.76905001176
    k_reg_uhf = 2000 * 0.310148420674

    hf_xy_blur = blur(jnp.stack([hf_x, hf_y]), SIGMA_UHF, BORDER_HF,
                      valid_hw)
    hf_x_blur, hf_y_blur = hf_xy_blur[0], hf_xy_blur[1]
    uhf_x = hf_x - hf_x_blur
    hf_x = remove_range_around_zero(k_remove_hf, hf_x_blur)

    uhf_y = hf_y - hf_y_blur
    hf_y2 = maximum_clamp(hf_y_blur, k_maxclamp_hf)
    uhf_y = maximum_clamp(uhf_y, k_maxclamp_uhf)
    uhf_y = _suppress_in_bright(uhf_y, lf[1], k_mul_s_uhf, k_reg_uhf)
    hf_y2 = _suppress_in_bright(hf_y2, lf[1], k_mul_s_hf, k_reg_hf)

    vx, vy, vb = xyb_lowfreq_to_vals(lf[0], lf[1], lf[2])

    return PsychoImage(
        lf=jnp.stack([vx, vy, vb]),
        mf=jnp.stack([mf_x, mf_y, mf_b]),
        hf=jnp.stack([hf_x, hf_y2]),
        uhf=jnp.stack([uhf_x, uhf_y]))
