"""Parity of the stripe-tiled staged metric (metric/fused_staged.py)
against both the jnp pipeline and the single-program mega-kernel, run
through the Pallas interpreter on CPU. Stripe cores are shrunk so small
canvases exercise multi-stripe tiling and the halo algebra."""

import numpy as np
import jax.numpy as jnp
import pytest

from guetzli_tpu.metric.opsin import opsin_dynamics_image
from guetzli_tpu.metric.frequencies import separate_frequencies
from guetzli_tpu.metric.diffmap import diffmap_psycho_image
from guetzli_tpu.metric import fused_pallas as fp
from guetzli_tpu.metric import fused_staged as fs

from test_fused_metric import _pair


@pytest.fixture
def small_stripes(monkeypatch):
    # 16-row cores at test canvases -> every stage runs >= 4 stripes.
    monkeypatch.setattr(fs, "_core_rows", lambda stage, W: 16)


@pytest.mark.parametrize("H,W,h,w", [(96, 128, 89, 97),
                                     (96, 128, 96, 128),
                                     (80, 112, 73, 103)])
def test_staged_matches_jnp(H, W, h, w, small_stripes):
    rng = np.random.default_rng(42)
    lin0, lin1 = _pair(rng, H, W, h, w)
    xyb0 = opsin_dynamics_image(jnp.asarray(lin0), (h, w))
    pi0 = separate_frequencies(xyb0, (h, w))
    pi1 = separate_frequencies(
        opsin_dynamics_image(jnp.asarray(lin1), (h, w)), (h, w))
    ref = np.asarray(diffmap_psycho_image(pi0, pi1, (h, w)))
    got = np.asarray(fs.staged_diffmap_batch(
        jnp.asarray(lin1)[None], fp.stack_pi0(pi0)[None],
        jnp.asarray([h], jnp.int32), jnp.asarray([w], jnp.int32),
        interpret=True))[0]
    scale = max(float(ref.max()), 1e-9)
    assert np.abs(ref - got).max() / scale < 1e-3
    assert abs(float(ref.max()) - float(got.max())) / scale < 2e-4
    assert not got[h:].any() and not got[:, w:].any()


def test_staged_matches_mega(small_stripes):
    """Stripes share the mega kernel's stage bodies (same shift-add
    order, same renormalization); the halo algebra is value-neutral.
    The two are separately compiled programs, so XLA/Mosaic may fuse
    FMAs differently between them — the contract is a tight tolerance
    (measured cross-program drift on CPU is <=1e-5 of peak), not
    bitwise equality. Within ONE path determinism stays bitwise
    (test_staged_batch_lanes_isolated)."""
    rng = np.random.default_rng(3)
    H, W, h, w = 96, 128, 89, 97
    lin0, lin1 = _pair(rng, H, W, h, w)
    pi0 = separate_frequencies(
        opsin_dynamics_image(jnp.asarray(lin0), (h, w)), (h, w))
    mega = np.asarray(fp.fused_diffmap(jnp.asarray(lin1), pi0, h, w,
                                       interpret=True))
    staged = np.asarray(fs.staged_diffmap_batch(
        jnp.asarray(lin1)[None], fp.stack_pi0(pi0)[None],
        jnp.asarray([h], jnp.int32), jnp.asarray([w], jnp.int32),
        interpret=True))[0]
    scale = max(float(np.abs(mega).max()), 1e-9)
    assert np.abs(mega - staged).max() / scale < 5e-5


def test_dispatch_above_mega_ceiling(small_stripes, monkeypatch):
    """fused_diffmap_batch routes canvases above the mega-kernel VMEM
    ceiling to the staged kernels (same API, same diffmap)."""
    monkeypatch.setattr(fp, "_FUSED_MAX_PIXELS", 4096)
    rng = np.random.default_rng(11)
    H, W, h, w = 96, 128, 89, 97
    lin0, lin1 = _pair(rng, H, W, h, w)
    pi0 = separate_frequencies(
        opsin_dynamics_image(jnp.asarray(lin0), (h, w)), (h, w))
    via_dispatch = np.asarray(fp.fused_diffmap(
        jnp.asarray(lin1), pi0, h, w, interpret=True))
    direct = np.asarray(fs.staged_diffmap_batch(
        jnp.asarray(lin1)[None], fp.stack_pi0(pi0)[None],
        jnp.asarray([h], jnp.int32), jnp.asarray([w], jnp.int32),
        interpret=True))[0]
    np.testing.assert_array_equal(via_dispatch, direct)


def test_staged_batch_lanes_isolated(small_stripes):
    rng = np.random.default_rng(7)
    H, W, h, w = 96, 128, 89, 97
    lin0, lin1 = _pair(rng, H, W, h, w)
    _, lin2 = _pair(rng, H, W, h, w, noise=4.0)
    pi0 = separate_frequencies(
        opsin_dynamics_image(jnp.asarray(lin0), (h, w)), (h, w))
    hs = jnp.asarray([h, h], jnp.int32)
    ws = jnp.asarray([w, w], jnp.int32)
    batched = np.asarray(fs.staged_diffmap_batch(
        jnp.stack([jnp.asarray(lin1), jnp.asarray(lin2)]),
        jnp.stack([fp.stack_pi0(pi0)] * 2), hs, ws, interpret=True))
    for i, lin in enumerate((lin1, lin2)):
        single = np.asarray(fs.staged_diffmap_batch(
            jnp.asarray(lin)[None], fp.stack_pi0(pi0)[None],
            hs[:1], ws[:1], interpret=True))[0]
        np.testing.assert_array_equal(batched[i], single)
