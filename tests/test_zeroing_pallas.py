"""Pallas zeroing mega-kernel parity (interpret mode, CPU).

The TPU kernel (search/zeroing_pallas.py) must reproduce the jnp greedy
search: identical candidate sequences and errors within f32 matmul-order
noise. Run in Pallas interpret mode so it executes anywhere.
"""

import numpy as np
import jax.numpy as jnp

from guetzli_tpu.search import zeroing
from guetzli_tpu.search.zeroing import candidate_scores, _postprocess
from guetzli_tpu.search.zeroing_pallas import zeroing_greedy_pallas


def test_pallas_greedy_matches_jnp(rng):
    n, steps = 24, 64
    quant = rng.integers(1, 24, (3, 64)).astype(np.int32)
    raw = rng.integers(-8, 9, (n, 3, 64)).astype(np.int32)
    raw[rng.random((n, 3, 64)) < 0.5] = 0
    cur = raw * quant[None]
    cur[:, :, 0] += rng.integers(1400, 2600, (n, 3))
    orig = cur.copy()
    xyb0 = (rng.random((n, 3, 8, 8)).astype(np.float32) * 40 - 10)
    mask3 = rng.random((n, 3)).astype(np.float32) * 0.1
    vw = np.full(n, 8, np.int32)
    vw[:4] = rng.integers(1, 9, 4)
    vh = np.full(n, 8, np.int32)
    vh[:4] = rng.integers(1, 9, 4)
    limit = np.full(n, 1e6, np.float32)  # generous: exercise nonzero counts

    idx_j, err_j, cnt_j = zeroing.compute_zeroing_order_batch(
        jnp.asarray(cur), jnp.asarray(orig), jnp.asarray(xyb0),
        jnp.asarray(mask3), jnp.asarray(vw), jnp.asarray(vh),
        jnp.asarray(limit), steps, 3, True)

    scores, valid = candidate_scores(jnp.asarray(cur), jnp.asarray(orig),
                                     7, True)
    order = jnp.argsort(scores, axis=1)
    n_valid = jnp.sum(valid, axis=1)
    idx_p, err_p = zeroing_greedy_pallas(
        jnp.asarray(cur.reshape(n, 192)), order.astype(jnp.int32),
        n_valid.astype(jnp.int32),
        jnp.asarray(xyb0.reshape(n, 3, 64)), jnp.asarray(mask3),
        jnp.asarray(vw), jnp.asarray(vh), steps, 3, interpret=True)
    errm_p, cnt_p = _postprocess(err_p, n_valid, steps,
                                 jnp.asarray(limit))

    assert np.array_equal(np.asarray(idx_j), np.asarray(idx_p))
    ej, ep = np.asarray(err_j), np.asarray(errm_p)
    fin = ej < 1e16
    assert fin.any()
    np.testing.assert_allclose(ep[fin], ej[fin], rtol=2e-4, atol=1e-5)
    assert np.array_equal(np.asarray(cnt_j), np.asarray(cnt_p))
    assert int(np.asarray(cnt_j).sum()) > 0


def test_pallas_greedy_420_luma_matches_jnp(rng):
    from guetzli_tpu.search.zeroing_pallas import (
        zeroing_greedy_pallas_420y)

    n, steps = 16, 64
    quant = rng.integers(1, 24, 64).astype(np.int32)
    raw = rng.integers(-8, 9, (n, 64)).astype(np.int32)
    raw[rng.random((n, 64)) < 0.5] = 0
    cur_y = raw * quant[None]
    cur_y[:, 0] += rng.integers(1400, 2600, n)
    orig_y = cur_y.copy()
    cb = rng.integers(0, 256, (n, 8, 8)).astype(np.int32)
    cr = rng.integers(0, 256, (n, 8, 8)).astype(np.int32)
    xyb0 = (rng.random((n, 3, 8, 8)).astype(np.float32) * 40 - 10)
    mask3 = rng.random((n, 3)).astype(np.float32) * 0.1
    vw = np.full(n, 8, np.int32)
    vh = np.full(n, 8, np.int32)
    vw[:3] = rng.integers(1, 9, 3)
    vh[:3] = rng.integers(1, 9, 3)
    limit = np.full(n, 1e6, np.float32)

    idx_j, err_j, cnt_j = zeroing.compute_zeroing_order_420_luma(
        jnp.asarray(cur_y), jnp.asarray(orig_y), jnp.asarray(cb),
        jnp.asarray(cr), jnp.asarray(xyb0), jnp.asarray(mask3),
        jnp.asarray(vw), jnp.asarray(vh), jnp.asarray(limit), steps, 3,
        True)

    cur3 = np.zeros((n, 3, 64), np.int32)
    cur3[:, 0, :] = cur_y
    scores, valid = candidate_scores(jnp.asarray(cur3),
                                     jnp.asarray(cur3), 1, True)
    order = jnp.argsort(scores, axis=1)
    n_valid = jnp.sum(valid, axis=1)
    idx_p, err_p = zeroing_greedy_pallas_420y(
        jnp.asarray(cur3.reshape(n, 192)), order.astype(jnp.int32),
        n_valid.astype(jnp.int32),
        jnp.asarray(xyb0.reshape(n, 3, 64)), jnp.asarray(mask3),
        jnp.asarray(vw), jnp.asarray(vh), jnp.asarray(cb),
        jnp.asarray(cr), steps, 3, interpret=True)
    errm_p, cnt_p = _postprocess(err_p, n_valid, steps,
                                 jnp.asarray(limit))

    assert np.array_equal(np.asarray(idx_j), np.asarray(idx_p))
    ej, ep = np.asarray(err_j), np.asarray(errm_p)
    fin = ej < 1e16
    np.testing.assert_allclose(ep[fin], ej[fin], rtol=2e-4, atol=1e-5)
    assert np.array_equal(np.asarray(cnt_j), np.asarray(cnt_p))
