"""Unit tests for the on-device refinement engine (refine_device.py).

Pins the device entropy-bit model and prefix-state machinery to the host
(numpy) twins: the frozen-depth size estimate must agree EXACTLY with the
histogram-based host computation right after a depth refresh, and the
scattered device state must equal the host reconstruction for any prefix
vector n.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from guetzli_tpu.entropy import histogram as hstats
from guetzli_tpu.jpeg import huffman
from guetzli_tpu.jpeg.data import NATURAL_ORDER
from guetzli_tpu.search import refine_device as rd


def _make_problem(rng, n=37, steps=64):
    quant = rng.integers(1, 30, (3, 64)).astype(np.int32)
    raw = rng.integers(-15, 16, (n, 3, 64)).astype(np.int32)
    raw[rng.random((n, 3, 64)) < 0.6] = 0
    state = raw * quant[None]
    cand_idx = np.zeros((n, steps), np.int32)
    cand_count = np.zeros(n, np.int32)
    for b in range(n):
        flat = state[b].reshape(192)
        valid = [i for i in range(192) if i % 64 != 0 and flat[i] != 0]
        rng.shuffle(valid)
        valid = valid[:steps]
        cand_idx[b, :len(valid)] = valid
        cand_count[b] = len(valid)
    prec = np.zeros((n, steps), dtype=bool)
    # mark a few candidates precious (skipped by application)
    prec[rng.random((n, steps)) < 0.1] = True
    prec &= np.arange(steps)[None, :] < cand_count[:, None]
    return quant, state, cand_idx, cand_count, prec


def _host_fudged_bits(state, quant, depths):
    """Per-comp entropy-coded bits (incl. escape fudge) from the python
    histogram path — the exact quantity _est_size models per component."""
    out = []
    for c in range(3):
        zz = (state[:, c, :] // quant[c][None])[:, NATURAL_ORDER]
        st = hstats.component_symbol_stream(zz.astype(np.int64))
        h = hstats.new_histogram()
        np.add.at(h, st.ac_symbols, 2)
        out.append(hstats.histogram_entropy_cost(h, depths[c]))
    return out


def _consts(quant, state, cand_idx, cand_count, prec, depths):
    n, steps = cand_idx.shape
    init192 = state.reshape(n, 192).astype(np.int32)
    zero_order, cand_zpos, zero_order_nat = rd.zeroing_order_tables(
        cand_idx, cand_count, prec)
    return rd.RefineConsts(
        cand_idx=jnp.asarray(cand_idx),
        cand_err=jnp.zeros((n, steps), jnp.float32),
        cand_count=jnp.asarray(cand_count),
        init192=jnp.asarray(init192),
        init_at_cand=jnp.asarray(
            init192[np.arange(n)[:, None], cand_idx]),
        prec=jnp.asarray(prec),
        quant_zz=jnp.asarray(
            np.stack([quant[c][NATURAL_ORDER[1:]] for c in range(3)])),
        depths=jnp.asarray(depths),
        pad_eob_bits=jnp.zeros(3, jnp.int32),
        frozen_fudged=jnp.int32(0),
        header_dc=jnp.int32(0),
        base_size=jnp.float32(1000.0),
        target=jnp.float32(1.0), wtarget=jnp.float32(1.0),
        block_limit=jnp.float32(1.0),
        stop_threshold=jnp.float32(np.inf),
        pi0=None, frozen_coeffs=(),
        valid_h=jnp.int32(8), valid_w=jnp.int32(8 * n),
        row_valid=jnp.ones(n, bool),
        zero_order=jnp.asarray(zero_order),
        cand_zpos=jnp.asarray(cand_zpos),
        zero_order_nat=jnp.asarray(zero_order_nat))


def _cfg(n, steps):
    return rd.RefineCfg(n_blocks=n, steps=steps, width=8 * n, height=8,
                        factors=(1, 1, 1), wfactor=1, comp_mask=7)


def test_bits_model_matches_host_histograms(rng):
    quant, state, cand_idx, cand_count, prec = _make_problem(rng)
    n, steps = cand_idx.shape
    # realistic depth tables from the initial state's histograms
    depths = np.zeros((3, 256), np.int32)
    for c in range(3):
        zz = (state[:, c, :] // quant[c][None])[:, NATURAL_ORDER]
        st = hstats.component_symbol_stream(zz.astype(np.int64))
        h = hstats.new_histogram()
        np.add.at(h, st.ac_symbols, 2)
        depths[c] = np.asarray(
            huffman.build_huffman_code_lengths(h))[:256]
    consts = _consts(quant, state, cand_idx, cand_count, prec, depths)
    cfg = _cfg(n, steps)

    cumdb3, bits0 = rd._bits_curve(consts, cfg)
    # At several prefix vectors, the curve-based estimate must equal the
    # host histogram computation on the reconstructed state exactly.
    for trial in range(4):
        nvec = (rng.integers(0, 1000, n) % (cand_count + 1)).astype(
            np.int32)
        if trial == 0:
            nvec[:] = 0
        if trial == 1:
            nvec = cand_count.astype(np.int32)
        st = rd.state_from_n_np(state.reshape(n, 192).astype(np.int32),
                                cand_idx, cand_count, prec, nvec)
        host = _host_fudged_bits(st.reshape(n, 3, 64), quant, depths)
        want = (sum(host) + 7) // 8
        got = int(rd._est_size(
            rd._bits_at(cumdb3, bits0, jnp.asarray(nvec), n), consts))
        assert got == want, (trial, got, want)


def test_closed_form_curve_matches_scan(rng):
    """The closed-form bit-delta curve (one symbol removed, next run
    merged, EOB edge) must equal the sequential full-recompute scan for
    every (block, candidate) prefix."""
    quant, state, cand_idx, cand_count, prec = _make_problem(rng)
    n, steps = cand_idx.shape
    depths = (rng.integers(1, 17, (3, 256))).astype(np.int32)
    consts = _consts(quant, state, cand_idx, cand_count, prec, depths)
    cfg = _cfg(n, steps)
    cum_fast, bits0_fast = rd._bits_curve(consts, cfg)
    cum_scan, bits0_scan = rd._bits_curve_scan(consts, cfg)
    assert np.array_equal(np.asarray(bits0_fast), np.asarray(bits0_scan))
    assert np.array_equal(np.asarray(cum_fast), np.asarray(cum_scan))


def test_state_scatter_matches_host(rng):
    quant, state, cand_idx, cand_count, prec = _make_problem(rng)
    n, steps = cand_idx.shape
    depths = np.zeros((3, 256), np.int32)
    consts = _consts(quant, state, cand_idx, cand_count, prec, depths)
    cfg = _cfg(n, steps)
    for _ in range(3):
        nvec = (rng.integers(0, 1000, n) % (cand_count + 1)).astype(
            np.int32)
        dev = np.asarray(rd._state_from_n(jnp.asarray(nvec), consts, cfg))
        host = rd.state_from_n_np(
            state.reshape(n, 192).astype(np.int32), cand_idx, cand_count,
            prec, nvec)
        assert np.array_equal(dev, host)


def test_score_matches_reference_scalar():
    from guetzli_tpu.search.score import score_jpeg
    for dist, size, target in [(0.9, 1000, 1.0), (1.0, 1000, 1.0),
                               (1.05, 1000, 1.0), (1.5, 1000, 1.0),
                               (3.0, 12345, 1.0)]:
        got = float(rd._score_jpeg(jnp.float32(dist), jnp.int32(size),
                                   jnp.float32(target)))
        want = score_jpeg(dist, size, target)
        assert got == pytest.approx(want, rel=1e-5)
