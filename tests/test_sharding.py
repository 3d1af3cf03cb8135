"""Multi-device sharding parity (SURVEY.md §4: sharded == unsharded).

Runs on the 8 virtual CPU devices from conftest. The sharded eval step
(dp images x sp image-rows) must produce the same distances/diffmaps as
the unsharded single-device path — GSPMD's halo exchanges for the blur
cascade and Malta stencils must be transparent.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from guetzli_tpu.parallel import mesh as pmesh
from jax.sharding import NamedSharding, PartitionSpec as P

from guetzli_tpu.parallel.sharded import (eval_candidate_batch,
                                          make_sharded_eval,
                                          precompute_pi0_batch)
from guetzli_tpu.ops.gamma import srgb8_to_linear_fast


@pytest.fixture(scope="module")
def batch_inputs(bees_rgb):
    rng = np.random.default_rng(7)
    h = w = 64
    b = 4
    crops = []
    for i in range(b):
        y0, x0 = 16 * i, 24 * i
        crops.append(bees_rgb[y0:y0 + h, x0:x0 + w])
    rgb = np.stack(crops).transpose(0, 3, 1, 2).astype(np.float32)
    lin = np.asarray(srgb8_to_linear_fast(jnp.asarray(rgb, jnp.int32)))
    coeffs = rng.integers(-64, 64, (b, 3, h // 8, w // 8, 64)).astype(
        np.int32)
    quant = rng.integers(1, 16, (b, 3, 64)).astype(np.int32)
    return lin, coeffs, quant, h, w


def test_sharded_matches_unsharded(batch_inputs):
    lin, coeffs, quant, h, w = batch_inputs
    assert len(jax.devices()) >= 8

    pi0 = precompute_pi0_batch(jnp.asarray(lin))
    # unsharded (single device semantics)
    d_ref, m_ref, q_ref = jax.jit(
        lambda c, q, p: eval_candidate_batch(c, q, p, h, w))(
        jnp.asarray(coeffs), jnp.asarray(quant), pi0)

    mesh = pmesh.make_mesh(dp=4, sp=2)
    step = make_sharded_eval(mesh, h, w)
    c_sh = jax.device_put(jnp.asarray(coeffs),
                          pmesh.batch_coeff_sharding(mesh))
    q_sh = jax.device_put(jnp.asarray(quant),
                      NamedSharding(mesh, P("dp", None, None)))
    pi0_sh = jax.device_put(pi0, pmesh.batch_image_sharding(mesh))
    d_sh, m_sh, qq_sh = step(c_sh, q_sh, pi0_sh)

    np.testing.assert_array_equal(np.asarray(q_ref), np.asarray(qq_sh))
    # f32 parity: halo exchange must not change values beyond reduction
    # reordering noise
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_sh),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_ref), np.asarray(m_sh),
                               rtol=2e-4, atol=2e-5)


def test_sharded_spatial_only(batch_inputs):
    """sp-major mesh: one image spread over 4 row shards."""
    lin, coeffs, quant, h, w = batch_inputs
    pi0 = precompute_pi0_batch(jnp.asarray(lin))
    d_ref, _, _ = jax.jit(
        lambda c, q, p: eval_candidate_batch(c, q, p, h, w))(
        jnp.asarray(coeffs), jnp.asarray(quant), pi0)

    mesh = pmesh.make_mesh(dp=2, sp=4)
    step = make_sharded_eval(mesh, h, w)
    d_sh, _, _ = step(jax.device_put(jnp.asarray(coeffs),
                                     pmesh.batch_coeff_sharding(mesh)),
                      jax.device_put(jnp.asarray(quant),
                                     NamedSharding(mesh,
                                                   P("dp", None, None))),
                      jax.device_put(pi0, pmesh.batch_image_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_sh),
                               rtol=2e-5, atol=1e-5)


def test_sp_sharded_encode_byte_identical(bees_rgb):
    """A real encode with the metric row-sharded over sp=2 must produce
    byte-identical output to the unsharded encode: spatial partitioning
    preserves per-pixel op order, f32 max is exact, entropy sums are
    int32 (the optimizer-on-the-mesh contract, round-2)."""
    import guetzli_tpu
    from guetzli_tpu.config import ProcessStats
    from guetzli_tpu.parallel import mesh as pmesh, runtime

    crop = np.ascontiguousarray(bees_rgb[:64, 32:96])
    plain = guetzli_tpu.process(crop, quality=95, stats=ProcessStats())
    mesh = pmesh.make_mesh(dp=1, sp=2, devices=jax.devices()[:2])
    with runtime.use_mesh(mesh):
        sharded = guetzli_tpu.process(crop, quality=95,
                                      stats=ProcessStats())
    assert sharded == plain


def test_dp_batch_on_mesh_matches_single(bees_rgb):
    """Batch mode over a (dp=4, sp=2) mesh: images land on disjoint
    submeshes, outputs byte-identical to single-image encodes."""
    from guetzli_tpu.config import ProcessStats
    import guetzli_tpu
    from guetzli_tpu.parallel import mesh as pmesh, runtime
    from guetzli_tpu.parallel.batch_mode import process_batch

    crops = [np.ascontiguousarray(bees_rgb[:64, 32:96]),
             np.ascontiguousarray(bees_rgb[16:80, 64:128])]
    singles = [guetzli_tpu.process(c, quality=95, stats=ProcessStats())
               for c in crops]
    mesh = pmesh.make_mesh(dp=4, sp=2)
    with runtime.use_mesh(mesh):
        outs = process_batch(crops, quality=95)
    assert outs == singles
