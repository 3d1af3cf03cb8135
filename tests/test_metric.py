"""Butteraugli parity tests vs the reference implementation (f32 both)."""

import numpy as np
import pytest

import oracle_util
from guetzli_tpu.metric import diffmap as dm
from guetzli_tpu.metric import frequencies, opsin
from guetzli_tpu.ops import blur as blur_mod
from guetzli_tpu.ops.gamma import SRGB8_TO_LINEAR


def to_linear(rgb):
    """(H, W, 3) uint8 -> (3, H, W) f32 linear, like the comparator ctor."""
    return SRGB8_TO_LINEAR[rgb].transpose(2, 0, 1).astype(np.float32)


def rel_err(a, b, floor=1e-6):
    return np.max(np.abs(a - b) / (np.maximum(np.abs(b), floor)))


@pytest.mark.parametrize("sigma,border", [
    (1.2, 0.0), (7.46953768697, -0.00457628248637),
    (3.734768843485, -0.271277366628), (9.24456601467, -0.0724948220913),
    (1.72547472444, 1.0),
])
def test_blur_parity(bees_rgb, sigma, border):
    plane = to_linear(bees_rgb)[1]
    ref = oracle_util.blur(plane, sigma, border)
    ours = np.asarray(blur_mod.blur(plane, sigma, border))
    assert np.max(np.abs(ours - ref)) < 2e-3 * max(1.0, np.abs(ref).max())


def test_blur_kernel_longer_than_axis(bees_rgb):
    """Border renormalization when the kernel (41 taps at sigma 9.24)
    is longer than the image axis — regression for the np.convolve
    'same' length bug (returns max(size, len(k)) elements)."""
    plane = to_linear(bees_rgb)[1][:24, :32]
    sigma, border = 9.24456601467, -0.0724948220913
    ref = oracle_util.blur(plane, sigma, border)
    ours = np.asarray(blur_mod.blur(plane, sigma, border))
    conv = np.asarray(blur_mod._blur_conv(plane, sigma, border, None))
    tol = 2e-3 * max(1.0, np.abs(ref).max())
    assert np.max(np.abs(ours - ref)) < tol
    assert np.max(np.abs(conv - ref)) < tol


def test_blur_multi_matches_per_plane(bees_rgb):
    """blur_multi (one batched multi-sigma matmul pair) == per-plane
    blur calls, static and dynamic-valid paths."""
    import jax.numpy as jnp
    planes = to_linear(bees_rgb)[:, :80, :96]
    specs = ((9.24456601467, -0.0724948220913),
             (2.3770330432, -0.0724948220913),
             (10.6666499623, 0.0))
    multi = np.asarray(blur_mod.blur_multi(jnp.asarray(planes), specs))
    single = np.stack([np.asarray(blur_mod.blur(planes[i], s, br))
                       for i, (s, br) in enumerate(specs)])
    assert np.max(np.abs(multi - single)) < 1e-4 * max(
        1.0, np.abs(single).max())
    h, w = 70, 85
    multi_d = np.asarray(blur_mod.blur_multi(
        jnp.asarray(planes), specs, (jnp.int32(h), jnp.int32(w))))
    single_d = np.stack(
        [np.asarray(blur_mod.blur(planes[i, :h, :w], s, br))
         for i, (s, br) in enumerate(specs)])
    assert np.max(np.abs(multi_d[:, :h, :w] - single_d)) < 1e-4 * max(
        1.0, np.abs(single_d).max())


def test_opsin_parity(bees_rgb):
    lin = to_linear(bees_rgb)
    ref = oracle_util.opsin(bees_rgb)
    ours = np.asarray(opsin.opsin_dynamics_image(lin))
    assert np.max(np.abs(ours - ref)) < 5e-3


def test_mask_parity(bees_rgb):
    # The oracle's `mask` mode feeds linear RGB planes straight into
    # butteraugli::Mask — do the same here (DiffPrecompute + blurs + LUTs).
    from guetzli_tpu.metric.mask import mask
    rgb1 = np.asarray(bees_rgb, dtype=np.int32) + 7
    rgb1 = np.clip(rgb1, 0, 255).astype(np.uint8)
    ref = oracle_util.mask(bees_rgb, rgb1)  # (6, H, W): mask + mask_dc
    m, mdc = mask(to_linear(bees_rgb), to_linear(rgb1))
    m, mdc = np.asarray(m), np.asarray(mdc)
    assert rel_err(m, ref[:3], floor=1e-3) < 0.02
    assert rel_err(mdc, ref[3:], floor=1e-3) < 0.02


def _diffmap_case(rgb0, rgb1, tol_rel=0.01, tol_abs=5e-3):
    ref_dist, ref_map = oracle_util.butteraugli_diffmap(rgb0, rgb1)
    ours_map = np.asarray(dm.butteraugli_diffmap(to_linear(rgb0),
                                                 to_linear(rgb1)))
    ours_dist = float(ours_map.max())
    assert abs(ours_dist - ref_dist) < tol_rel * max(ref_dist, 0.1) + 1e-4, \
        (ours_dist, ref_dist)
    # Pointwise: diffmap within tolerance where it matters (above noise).
    err = np.abs(ours_map - ref_map)
    assert np.max(err) < tol_rel * max(ref_map.max(), 0.1) + tol_abs, \
        np.max(err)


def test_diffmap_jpeg_distortion(bees_rgb):
    """Distance on an actual JPEG-compressed version of bees."""
    import io
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(bees_rgb).save(buf, format="JPEG", quality=90)
    rgb1 = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    _diffmap_case(bees_rgb, rgb1)


def test_diffmap_noise(bees_rgb, rng):
    noise = rng.integers(-6, 7, bees_rgb.shape, dtype=np.int32)
    rgb1 = np.clip(bees_rgb.astype(np.int32) + noise, 0, 255).astype(np.uint8)
    _diffmap_case(bees_rgb, rgb1)


def test_identity_distance_zero(bees_rgb):
    d = float(np.asarray(
        dm.butteraugli_distance(to_linear(bees_rgb), to_linear(bees_rgb))))
    assert d == 0.0


def test_block_weights_all_matches_reference_twin():
    """_block_weights_all (the fused 8-grid production path) must equal the
    direct per-(direction, rblock) reference formulation _block_weights."""
    import jax.numpy as jnp
    from guetzli_tpu.metric.comparator import (_block_weights,
                                               _block_weights_all)

    rng = np.random.default_rng(0)
    dmap = jnp.asarray((rng.random((130, 222)) * 2).astype(np.float32))
    td = jnp.float32(0.9718)
    allw = np.asarray(_block_weights_all(dmap, td, 1, 222, 130))
    i = 0
    for direction in (1, -1):
        for rb in range(1, 5):
            ref = np.asarray(_block_weights(dmap, td, 1, 1, direction, rb,
                                            222, 130))
            np.testing.assert_allclose(allw[i], ref, atol=1e-6)
            i += 1


def test_malta_pallas_matches_conv():
    """The Pallas Malta stencil kernel (interpret mode on CPU) must match
    the conv formulation to f32 rounding."""
    import jax.numpy as jnp
    from guetzli_tpu.metric.malta import _kernels
    from guetzli_tpu.metric.malta_pallas import malta_sum_of_squares_pallas
    import jax as _jax

    rng = np.random.default_rng(3)
    d = jnp.asarray(rng.normal(0, 1, (2, 66, 150)).astype(np.float32))
    for lf in (False, True):
        x = d[:, None, :, :]
        kern = jnp.asarray(_kernels(lf))
        sums = _jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding=[(4, 4), (4, 4)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=_jax.lax.Precision.HIGHEST)
        ref = np.asarray(jnp.sum(sums * sums, axis=1))
        got = np.asarray(malta_sum_of_squares_pallas(d, lf, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)
