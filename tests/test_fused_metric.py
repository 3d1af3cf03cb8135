"""Parity of the Pallas metric mega-kernel (metric/fused_pallas.py)
against the jnp pipeline it replaces (opsin -> separate_frequencies ->
diffmap_psycho_image), run through the Pallas interpreter on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from guetzli_tpu.metric.opsin import opsin_dynamics_image
from guetzli_tpu.metric.frequencies import separate_frequencies
from guetzli_tpu.metric.diffmap import diffmap_psycho_image
from guetzli_tpu.metric import fused_pallas as fp


def _smooth(rng, shape, sigma=3.0):
    x = rng.normal(size=shape)
    k = np.exp(-np.arange(-8, 9) ** 2 / (2 * sigma ** 2))
    k /= k.sum()
    for ax in range(2):
        x = np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="same"), ax, x)
    x = (x - x.min()) / (x.max() - x.min() + 1e-9)
    return (x * 200 + 20).astype(np.float32)


def _pair(rng, H, W, h, w, noise=2.0):
    lin0 = np.stack([_smooth(rng, (H, W)) for _ in range(3)])
    lin1 = (lin0 + rng.normal(scale=noise, size=lin0.shape)
            ).astype(np.float32)
    lin0[:, h:, :] = 0
    lin0[:, :, w:] = 0
    return lin0, lin1


@pytest.mark.parametrize("H,W,h,w", [(64, 128, 57, 97), (64, 128, 64, 128),
                                     (48, 112, 41, 103)])
def test_fused_diffmap_matches_jnp(H, W, h, w):
    rng = np.random.default_rng(42)
    lin0, lin1 = _pair(rng, H, W, h, w)
    xyb0 = opsin_dynamics_image(jnp.asarray(lin0), (h, w))
    pi0 = separate_frequencies(xyb0, (h, w))
    pi1 = separate_frequencies(
        opsin_dynamics_image(jnp.asarray(lin1), (h, w)), (h, w))
    ref = np.asarray(diffmap_psycho_image(pi0, pi1, (h, w)))
    got = np.asarray(fp.fused_diffmap(jnp.asarray(lin1), pi0, h, w,
                                      interpret=True))
    scale = max(float(ref.max()), 1e-9)
    # Only f32 summation order inside the blurs differs.
    assert np.abs(ref - got).max() / scale < 1e-3
    assert abs(float(ref.max()) - float(got.max())) / scale < 2e-4
    # the pad region must be exactly zero (the packed weight grids and
    # the distance max read the whole canvas)
    assert not got[h:].any() and not got[:, w:].any()


def test_fused_diffmap_vmap_batch():
    """The batched-refine path vmaps the kernel; lanes must be isolated
    and identical to single calls."""
    rng = np.random.default_rng(7)
    H, W, h, w = 64, 128, 57, 97
    lin0, lin1 = _pair(rng, H, W, h, w)
    _, lin2 = _pair(rng, H, W, h, w, noise=4.0)
    pi0 = separate_frequencies(
        opsin_dynamics_image(jnp.asarray(lin0), (h, w)), (h, w))
    singles = [np.asarray(fp.fused_diffmap(jnp.asarray(l), pi0, h, w,
                                           interpret=True))
               for l in (lin1, lin2)]
    batched = np.asarray(jax.vmap(
        lambda l: fp.fused_diffmap(l, pi0, h, w, interpret=True))(
            jnp.stack([jnp.asarray(lin1), jnp.asarray(lin2)])))
    np.testing.assert_array_equal(batched[0], singles[0])
    np.testing.assert_array_equal(batched[1], singles[1])


def test_fused_requant_batch_matches_map():
    """_requant_compare_impl's fused branch (all candidates through one
    grid=(B,) Pallas launch) must match the per-candidate lax.map path
    to metric tolerance, and must match a loop of single fused calls
    exactly (same kernel, one instance per candidate)."""
    from guetzli_tpu.metric.comparator import _requant_compare_impl

    rng = np.random.default_rng(11)
    H, W = 64, 128
    h, w = 57, 97
    lin0, _ = _pair(rng, H, W, h, w)
    pi0 = separate_frequencies(
        opsin_dynamics_image(jnp.asarray(lin0), (h, w)), (h, w))
    base = jnp.asarray(
        rng.integers(-512, 513, size=(3, H // 8, W // 8, 64))
        .astype(np.int32))
    q = jnp.asarray(rng.integers(8, 64, size=(4, 3, 64)).astype(np.int32))
    args = (base, q, pi0, jnp.int32(h), jnp.int32(w), W, H, (1, 1, 1))
    d_map = np.asarray(_requant_compare_impl(*args, fused=False))
    d_fused = np.asarray(_requant_compare_impl(*args, fused=True))
    np.testing.assert_allclose(d_fused, d_map, rtol=2e-4)
    singles = np.asarray([
        _requant_compare_impl(base, q[i:i + 1], pi0, jnp.int32(h),
                              jnp.int32(w), W, H, (1, 1, 1), fused=True)[0]
        for i in range(q.shape[0])])
    np.testing.assert_array_equal(d_fused, singles)


def test_fused_compare_impl_end_to_end():
    """_compare_coeffs_impl with fused=True must agree with fused=False
    through the full decode -> metric -> packed-weights path."""
    from guetzli_tpu.metric.comparator import _compare_coeffs_impl

    rng = np.random.default_rng(3)
    H, W = 64, 128
    h, w = 57, 97
    lin0, _ = _pair(rng, H, W, h, w)
    pi0 = separate_frequencies(
        opsin_dynamics_image(jnp.asarray(lin0), (h, w)), (h, w))
    coeffs = jnp.asarray(
        rng.integers(-64, 65, size=(3, H // 8, W // 8, 64))
        .astype(np.int32) * 8)
    args = (coeffs, pi0, jnp.float32(1.0), W, H, (1, 1, 1), 1)
    dmap_a, packed_a = _compare_coeffs_impl(*args, valid_hw=(h, w),
                                            fused=False)
    dmap_b, packed_b = _compare_coeffs_impl(*args, valid_hw=(h, w),
                                            fused=True)
    pa, pb = np.asarray(packed_a), np.asarray(packed_b)
    scale = max(abs(pa[0]), 1e-9)
    assert abs(pa[0] - pb[0]) / scale < 2e-4          # distance
    # weight grids are thresholded; the threshold inputs differ by ~1e-6
    # relative, so grids must agree except at razor-edge ties
    assert (pa[1:] != pb[1:]).mean() < 0.01


def test_probe_fused_fallback(monkeypatch):
    """probe_fused validates a bucket once; a kernel failure disables the
    fused path for THAT BUCKET only instead of propagating (the encode
    then uses the XLA metric path; other buckets keep the kernel)."""
    monkeypatch.setenv("GUETZLI_TPU_NO_PROBE_CACHE", "1")
    rng = np.random.default_rng(7)
    H, W, h, w = 48, 112, 41, 103
    lin0, lin1 = _pair(rng, H, W, h, w)
    pi0 = separate_frequencies(
        opsin_dynamics_image(jnp.asarray(lin0), (h, w)), (h, w))

    key = fp.bucket_key(H, W)   # probe/broken keys are PADDED canvas dims
    fp._BROKEN_BUCKETS.discard(key)
    fp._PROBED_OK.discard(key)
    assert fp.probe_fused(jnp.asarray(lin1), pi0, h, w)
    assert key in fp._PROBED_OK
    # second probe of the same bucket: cached, no kernel run
    monkeypatch.setattr(fp, "fused_diffmap",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("probe not cached")))
    assert fp.probe_fused(jnp.asarray(lin1), pi0, h, w)

    # failure path: raising kernel -> False + per-bucket disable
    fp._PROBED_OK.discard(key)
    def boom(*a, **k):
        raise RuntimeError("RESOURCE_EXHAUSTED: vmem")
    monkeypatch.setattr(fp, "fused_diffmap", boom)
    assert not fp.probe_fused(jnp.asarray(lin1), pi0, h, w)
    assert key in fp._BROKEN_BUCKETS
    assert not fp.fused_metric_eligible(H, W)
    # a different bucket is unaffected (per-bucket, not process-wide)
    assert fp.bucket_key(64, 200) not in fp._BROKEN_BUCKETS
    monkeypatch.setenv("GUETZLI_TPU_FUSED_METRIC", "1")
    monkeypatch.setattr(fp, "_ENV", "1")
    assert fp.fused_metric_eligible(64, 200)
    fp._BROKEN_BUCKETS.discard(key)


def test_fused_under_batched_predicate_while(monkeypatch):
    """Regression: a vmapped lax.while_loop whose predicate depends on
    batched carry (the batched refine chunk's per-lane phase_done)
    broadcasts the body jaxpr's consts; jax.custom_vmap asserts its
    function closes over no batched consts. The kernel entry therefore
    takes the blur-weight aux (hw/invh/invw) as formal args (_prep_aux)
    instead of building it inside. This traces the hardware custom_vmap
    path (backend faked to tpu; trace only, nothing lowered)."""
    from guetzli_tpu.metric.comparator import _compare_coeffs_impl
    from guetzli_tpu.metric.diffmap import PsychoImage

    monkeypatch.setattr(fp.jax, "default_backend", lambda: "tpu")
    H, W = 304, 480
    nby, nbx = H // 8, W // 8

    def one(coeffs, pi0_planes, h, w):
        pi0 = PsychoImage(lf=tuple(pi0_planes[i] for i in range(3)),
                          mf=tuple(pi0_planes[i] for i in (3, 4, 5)),
                          hf=tuple(pi0_planes[i] for i in (6, 7)),
                          uhf=tuple(pi0_planes[i] for i in (8, 9)))

        def body(state):
            i, acc = state

            def run(_):
                c = coeffs + i
                _, packed = _compare_coeffs_impl(
                    c, pi0, jnp.float32(1.0), W, H, (1, 1, 1), 1,
                    valid_hw=(h, w), fused=True)
                return acc + packed[0]

            acc2 = jax.lax.cond(i < 1, run, lambda _: acc, operand=None)
            return i + 1, acc2

        # predicate depends on batched carry -> consts get broadcast
        return jax.lax.while_loop(
            lambda s: (s[0] < 2) & (s[1] < h.astype(jnp.float32)),
            body, (jnp.int32(0), jnp.float32(0.)))[1]

    jax.make_jaxpr(jax.vmap(one))(
        jnp.ones((3, 3, nby, nbx, 64), jnp.int32),
        jnp.ones((3, 10, H, W)),
        jnp.full((3,), 258, jnp.int32), jnp.full((3,), 444, jnp.int32))


def test_probe_result_persistence(monkeypatch, tmp_path):
    """A successful probe's outcome persists next to the XLA compile
    cache: a 'fresh process' (cleared in-memory sets, same cache dir)
    skips the compile-and-run entirely — the cold-start path. Failures
    do NOT persist (transients re-probe next process), and a kernel-
    source change invalidates the store (salt mismatch)."""
    import jax as _jax
    monkeypatch.delenv("GUETZLI_TPU_NO_PROBE_CACHE", raising=False)
    old_dir = _jax.config.jax_compilation_cache_dir
    _jax.config.update("jax_compilation_cache_dir", str(tmp_path))
    try:
        rng = np.random.default_rng(11)
        H, W, h, w = 48, 112, 41, 103
        lin0, lin1 = _pair(rng, H, W, h, w)
        pi0 = separate_frequencies(
            opsin_dynamics_image(jnp.asarray(lin0), (h, w)), (h, w))
        key = fp.bucket_key(H, W)
        fp._BROKEN_BUCKETS.discard(key)
        fp._PROBED_OK.discard(key)
        assert fp.probe_fused(jnp.asarray(lin1), pi0, h, w)
        assert (tmp_path / "probe_ok.json").exists()

        # fresh process: in-memory caches empty, store present -> no run
        fp._PROBED_OK.discard(key)
        monkeypatch.setattr(fp, "fused_diffmap",
                            lambda *a, **k: (_ for _ in ()).throw(
                                AssertionError("probe not skipped")))
        assert fp.probe_fused(jnp.asarray(lin1), pi0, h, w)
        assert key in fp._PROBED_OK

        # salt mismatch (kernel code changed) -> store ignored, re-probe
        fp._PROBED_OK.discard(key)
        monkeypatch.setattr(fp, "_probe_salt", lambda: "deadbeef")
        def boom(*a, **k):
            raise RuntimeError("RESOURCE_EXHAUSTED: vmem")
        monkeypatch.setattr(fp, "fused_diffmap", boom)
        assert not fp.probe_fused(jnp.asarray(lin1), pi0, h, w)
        # ... and the failure did not overwrite the persisted OK
        import json as _json
        data = _json.loads((tmp_path / "probe_ok.json").read_text())
        assert all(v.get("path") for v in data.values())
        fp._BROKEN_BUCKETS.discard(key)
    finally:
        _jax.config.update("jax_compilation_cache_dir", old_dir)
