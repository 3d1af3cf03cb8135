"""Size-bucket parity: padded-canvas dynamic-size computations must match
the exact-size static computations on the valid region.

The bucketed path (GUETZLI_TPU_NO_BUCKETS unset) computes every metric
stage on a padded canvas with the true (h, w) as runtime scalars; border
renormalization moves in-graph (f32) instead of host-precomputed (f64),
so equality is to f32 tolerance, not bitwise.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from guetzli_tpu.metric.comparator import (_compare_coeffs_fused,
                                           _compare_coeffs_fused_dyn,
                                           _precompute_pi0_dyn,
                                           bucket_dim)
from guetzli_tpu.metric.frequencies import separate_frequencies
from guetzli_tpu.metric.opsin import opsin_dynamics_image
from guetzli_tpu.ops.blur import blur
from guetzli_tpu.ops.gamma import srgb8_to_linear_fast


def test_bucket_ladder():
    assert bucket_dim(1) == 64
    assert bucket_dim(64) == 64
    assert bucket_dim(65) == 80
    assert bucket_dim(258) == 304
    assert bucket_dim(448) == 480
    prev = 64
    for s in range(65, 5000, 97):
        b = bucket_dim(s)
        assert b >= s and b % 16 == 0
        assert b / s < 1.3 or b == 64


@pytest.mark.parametrize("sigma,br", [(1.2, 0.0), (7.47, -0.00457628248637),
                                      (9.04, -0.0724948220913),
                                      (1.725, 1.0)])
def test_blur_dynamic_matches_static(rng, sigma, br):
    h, w = 57, 83
    hb, wb = 80, 112
    x = rng.random((h, w)).astype(np.float32) * 100
    want = np.asarray(blur(jnp.asarray(x), sigma, br))
    pad = np.zeros((hb, wb), np.float32)
    pad[:h, :w] = x
    got = np.asarray(blur(jnp.asarray(pad), sigma, br,
                          (jnp.int32(h), jnp.int32(w))))[:h, :w]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)


def test_fancy_upsample_dyn_matches_static(rng):
    from guetzli_tpu.image.output_image import (fancy_upsample_16,
                                                fancy_upsample_16_dyn)
    h, w = 57, 83
    hb, wb = 80, 112
    sub_true = rng.integers(0, 255 * 16, (-(-h // 2), -(-w // 2))).astype(
        np.int32)
    want = np.asarray(fancy_upsample_16(jnp.asarray(sub_true), h, w))
    sub_pad = np.zeros((hb // 2, wb // 2), np.int32)
    sub_pad[:sub_true.shape[0], :sub_true.shape[1]] = sub_true
    got = np.asarray(fancy_upsample_16_dyn(
        jnp.asarray(sub_pad), jnp.int32(h), jnp.int32(w), hb, wb))
    assert np.array_equal(got[:h, :w], want)


def test_fused_compare_bucketed_matches_exact(rng):
    h, w = 70, 90
    hb, wb = bucket_dim(h), bucket_dim(w)
    rgb = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)

    # original psycho-image, both ways
    lin = srgb8_to_linear_fast(jnp.asarray(rgb.transpose(2, 0, 1)))
    pi0_u = separate_frequencies(opsin_dynamics_image(lin))
    pad = np.zeros((hb, wb, 3), np.uint8)
    pad[:h, :w] = rgb
    lin_b = srgb8_to_linear_fast(jnp.asarray(pad.transpose(2, 0, 1)))
    _, pi0_b = _precompute_pi0_dyn(lin_b, jnp.int32(h), jnp.int32(w))

    # candidate coefficients: a valid quantized 444 grid
    nby, nbx = -(-h // 8), -(-w // 8)
    quant = rng.integers(1, 20, (3, 64)).astype(np.int32)
    raw = rng.integers(-6, 7, (3, nby, nbx, 64)).astype(np.int32)
    coeffs = raw * quant[:, None, None, :]
    coeffs[:, :, :, 0] += 128 * 16   # plausible DC

    dmap_u, packed_u = _compare_coeffs_fused(
        jnp.asarray(coeffs), pi0_u, jnp.float32(1.0), w, h, (1, 1, 1), 1)
    cpad = np.zeros((3, hb // 8, wb // 8, 64), np.int32)
    cpad[:, :nby, :nbx] = coeffs
    dmap_b, packed_b = _compare_coeffs_fused_dyn(
        jnp.asarray(cpad), pi0_b, jnp.float32(1.0),
        jnp.int32(h), jnp.int32(w), wb, hb, (1, 1, 1), 1)

    du, db = np.asarray(dmap_u), np.asarray(dmap_b)
    assert np.all(db[h:, :] == 0) and np.all(db[:, w:] == 0)
    np.testing.assert_allclose(db[:h, :w], du, rtol=5e-4, atol=5e-4)
    dist_u, dist_b = float(packed_u[0]), float(packed_b[0])
    assert abs(dist_b - dist_u) <= 5e-4 * max(dist_u, 1.0)

    # weight grids: thresholded values; equal except measure-zero ties
    bh, bw_ = nby, nbx
    wu = np.asarray(packed_u[1:]).reshape(8, bh, bw_)
    wb_ = np.asarray(packed_b[1:]).reshape(8, hb // 8, wb // 8)[:, :bh,
                                                                :bw_]
    frac_equal = np.mean(wu == wb_)
    assert frac_equal > 0.99, frac_equal
