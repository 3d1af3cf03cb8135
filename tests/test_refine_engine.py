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


def test_bits_setup_fast_path_matches_full(rng):
    """The split pass-constant-setup + per-chunk-depth-apply path must
    reproduce the monolithic closed-form curve exactly (it is the same
    int32 arithmetic with the depth gathers factored out)."""
    quant, state, cand_idx, cand_count, prec = _make_problem(rng)
    n, steps = cand_idx.shape
    for trial in range(3):
        depths = (rng.integers(1, 17, (3, 256))).astype(np.int32)
        consts = _consts(quant, state, cand_idx, cand_count, prec,
                         depths)
        cfg = _cfg(n, steps)
        cum_full, bits0_full = rd._bits_curve_full(consts, cfg)
        consts_fast = consts._replace(
            bit_setup=rd.bits_setup(consts, cfg))
        cum_fast, bits0_fast = rd._bits_curve(consts_fast, cfg)
        assert np.array_equal(np.asarray(bits0_fast),
                              np.asarray(bits0_full))
        assert np.array_equal(np.asarray(cum_fast), np.asarray(cum_full))


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


def _legacy_select_np(vals, valid, n, cumdb3, bits0, up, min_coeffs,
                      prev_size, min_size_delta, consts):
    """Numpy model of the ORIGINAL sort-based stopping rule (full stable
    sort + rank bisection with block-major tie split) — the semantics the
    sortless two-stage bisection in _iteration must reproduce exactly."""
    nb = vals.shape[0]
    total = int(valid.sum())
    sorted_vals = np.sort(vals.reshape(-1), kind="stable")
    header_dc = int(consts.header_dc)
    frozen = int(consts.frozen_fudged)

    def est_size(bits3):
        fudged = bits3 + ((bits3 * 3 + 512) >> 10)
        return header_dc + ((int(fudged.sum()) + frozen + 7) // 8)

    def j_at(m):
        vstar = sorted_vals[m - 1]
        lt_b = ((vals < vstar) & valid).sum(axis=1).astype(np.int64)
        eq_b = ((vals == vstar) & valid).sum(axis=1).astype(np.int64)
        need = m - lt_b.sum()
        cum_eq = np.cumsum(eq_b) - eq_b
        extra = np.clip(need - cum_eq, 0, eq_b)
        return (lt_b + extra).astype(np.int32)

    def est_at(m):
        j = j_at(m)
        n_new = n + (j if up else -j)
        bits3 = bits0 + cumdb3[np.arange(nb), n_new, :].sum(axis=0)
        return est_size(bits3), j, n_new

    def cond_m(m):
        est, _, _ = est_at(m)
        return (m > min_coeffs) and (abs(est - prev_size)
                                     > min_size_delta)

    if not cond_m(total):
        m = total
    else:
        lo, hi = max(min_coeffs, 0), total
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if cond_m(mid):
                hi = mid
            else:
                lo = mid
        m = hi
    est, j, n_new = est_at(m)
    return m, j, n_new, est, sorted_vals[m - 1]


@pytest.mark.parametrize("levels", [1, 3])
@pytest.mark.parametrize("direction,seed", [(1, 0), (1, 1), (-1, 2),
                                            (-1, 3), (1, 4), (-1, 5)])
def test_selection_matches_sort_model(rng, direction, seed, levels):
    """One _iteration step (compare stubbed) must pick the same m, the
    same per-block applied counts, the same size estimate and the same
    value threshold as the sort-based reference — including engineered
    value ties across blocks. levels=3 exercises the grouped (oct-ary)
    bisection, which must be decision-for-decision identical to the
    plain binary one."""
    r = np.random.default_rng(seed)
    quant, state, cand_idx, cand_count, prec = _make_problem(r)
    nb, steps = cand_idx.shape
    depths = (r.integers(1, 17, (3, 256))).astype(np.int32)
    # monotone error curves with deliberate plateau ties (quantized)
    cand_err = np.sort(
        np.round(r.random((nb, steps)).astype(np.float32) * 8) / 4.0,
        axis=1).astype(np.float32)
    consts = _consts(quant, state, cand_idx, cand_count, prec, depths)
    consts = consts._replace(cand_err=jnp.asarray(cand_err),
                             base_size=jnp.float32(500.0))
    cfg = _cfg(nb, steps)._replace(bisect_group=levels)

    n0 = (r.integers(0, 1000, nb) % (cand_count + 1)).astype(np.int32)
    if direction > 0:
        n0 //= 2
    w = np.where(r.random((8, nb)) < 0.3, 0.0,
                 r.integers(1, 5, (8, nb)) / 2.0).astype(np.float32)
    carry = rd.init_carry(nb, 1.2)._replace(
        n=jnp.asarray(n0), direction=jnp.int32(direction),
        first_up=jnp.bool_(False), w_grids=jnp.asarray(w),
        mbe=jnp.asarray((r.random(nb) * 2).astype(np.float32)))

    stub = lambda s, c, f: (jnp.float32(1.2),
                            jnp.ones((8, cfg.n_blocks), jnp.float32))
    orig_cmp = rd._compare_state
    rd._compare_state = stub
    try:
        cumdb3, bits0 = rd._bits_curve(consts, cfg)
        db3 = cumdb3[:, 1:, :] - cumdb3[:, :-1, :]
        new_carry, row = rd._iteration(carry, consts, cfg, cumdb3,
                                       bits0, db3)
        row = np.asarray(row)
        n_new_dev = np.asarray(new_carry.n)
    finally:
        rd._compare_state = orig_cmp
    if row[0] == 0:
        return  # halted (no valid candidates for this draw) — fine

    # --- numpy twin of the iteration's selection preamble ---
    up = direction > 0
    t = np.arange(steps)[None, :]
    base_valid = ((t >= n0[:, None]) & (t < cand_count[:, None])
                  if up else t < n0[:, None])
    di = 0 if up else 4
    w_sel = None
    for rb in range(4):
        w_rb = w[di + rb]
        if (((w_rb > 0)[:, None]) & base_valid).sum() > 0:
            w_sel = w_rb
            break
    assert w_sel is not None
    wpos = w_sel > 0
    valid = wpos[:, None] & base_valid
    mbe = np.asarray(carry.mbe)
    raw = (cand_err - mbe[:, None] if up else
           mbe[:, None] - cand_err).astype(np.float32)
    wsafe = np.where(wpos, w_sel, 1.0).astype(np.float32)[:, None]
    vals = np.where(valid, (raw / wsafe).astype(np.float32),
                    np.inf).astype(np.float32)

    btc = (((n0 < cand_count) & wpos).sum() if up
           else ((n0 > 0) & wpos).sum())
    dist_ok = 1.2 <= float(consts.target)
    rel = (0.05 if dist_ok else 0.01) if up else 0.0005
    min_size_delta = 500.0 * rel
    min_coeffs = int(np.float32(2.0 if up else 0.2) * np.float32(btc))

    cum_np = np.asarray(cumdb3)
    bits0_np = np.asarray(bits0)
    prev = int(rd._est_size(rd._bits_at(cumdb3, bits0,
                                        jnp.asarray(n0), nb), consts))
    m, j, n_new, est, vthr = _legacy_select_np(
        vals, valid, n0, cum_np, bits0_np, up, min_coeffs, prev,
        min_size_delta, consts)

    assert int(row[2]) == m
    assert np.array_equal(n_new_dev, n_new)
    assert int(row[4]) == est
    assert row[3] == np.float32(vthr)


def test_score_matches_reference_scalar():
    from guetzli_tpu.search.score import score_jpeg
    for dist, size, target in [(0.9, 1000, 1.0), (1.0, 1000, 1.0),
                               (1.05, 1000, 1.0), (1.5, 1000, 1.0),
                               (3.0, 12345, 1.0)]:
        got = float(rd._score_jpeg(jnp.float32(dist), jnp.int32(size),
                                   jnp.float32(target)))
        want = score_jpeg(dist, size, target)
        assert got == pytest.approx(want, rel=1e-5)
