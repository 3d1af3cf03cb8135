"""Native (C++) vs pure-Python twin parity.

The native host runtime (guetzli_tpu/native/host_runtime.cc) silently
replaces the Python Huffman/clustering/histogram/scan-packing paths when
the shared library builds. These tests pin the two implementations
together: identical output bytes for the serializer, identical
entropy-size / clustering / global-order results — so a twin divergence
fails CI instead of shipping machine-dependent output.
"""

import io

import numpy as np
import pytest
from PIL import Image

from guetzli_tpu import native
from guetzli_tpu.entropy import histogram as hstats
from guetzli_tpu.jpeg import huffman, reader, writer

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime not built")


def _make_jpeg(rgb, **kwargs):
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="JPEG", **kwargs)
    return buf.getvalue()


def _force_python(monkeypatch):
    monkeypatch.setattr(native, "available", lambda: False)


@pytest.fixture()
def random_histos(rng):
    out = []
    for _ in range(6):
        h = hstats.new_histogram()
        syms = rng.integers(0, 256, size=300)
        np.add.at(h, syms, 2)
        out.append(h)
    # include a sparse and an empty-ish histogram (cluster edge cases)
    h = hstats.new_histogram()
    h[3] = 2
    out.append(h)
    out.append(hstats.new_histogram())
    return out


def test_huffman_depths_parity(random_histos):
    for h in random_histos:
        want = huffman.build_huffman_code_lengths(h)
        got = native.huffman_depths(h)
        assert np.array_equal(np.asarray(want), got[: len(want)])


def test_cluster_parity(random_histos, monkeypatch):
    got = native.cluster_full(random_histos)
    got_cost = native.cluster_cost(random_histos)
    got_entropy = native.entropy_size(random_histos)
    _force_python(monkeypatch)
    clustered, indexes, depths, cost = writer._cluster_histograms(
        random_histos)
    assert [list(c) for c in got[0]] == [list(c) for c in clustered]
    assert list(got[1]) == list(indexes)
    assert [list(d[: len(b)]) for d, b in zip(got[2], depths)] == \
        [list(b) for b in depths]
    assert got_cost == cost
    from guetzli_tpu.search.processor import Processor
    assert got_entropy == Processor._entropy_size(random_histos)


def test_component_histograms_parity(rng):
    zz = rng.integers(-40, 41, size=(57, 64)).astype(np.int32)
    zz[rng.random(zz.shape) < 0.7] = 0
    dch_n, ach_n = native.component_histograms(zz)
    st = hstats.component_symbol_stream(zz)
    dch = hstats.new_histogram()
    np.add.at(dch, st.dc_symbols, 2)
    ach = hstats.new_histogram()
    np.add.at(ach, st.ac_symbols, 2)
    assert np.array_equal(dch_n, dch)
    assert np.array_equal(ach_n, ach)

    pb_n = native.block_ac_histograms(zz)
    pb = np.zeros((zz.shape[0], 256), dtype=np.int64)
    np.add.at(pb, (st.ac_block_id, st.ac_symbols), 2)
    assert np.array_equal(pb_n, pb)


def test_delta_and_commit_hist_parity(rng):
    zz = rng.integers(-20, 21, size=(40, 64)).astype(np.int32)
    zz[rng.random(zz.shape) < 0.6] = 0
    perblock = native.block_ac_histograms(zz)
    touched = np.array([3, 7, 21], dtype=np.int64)
    from guetzli_tpu.jpeg.data import NATURAL_ORDER
    # rows in natural (row-major) order: delta_hist re-zigzags internally
    inv = np.empty(64, dtype=np.int64)
    inv[NATURAL_ORDER] = np.arange(64)
    new_rows_nat = zz[touched][:, inv].copy()
    new_rows_nat[:, NATURAL_ORDER[5]] += 3      # mutate one coefficient
    new_zz = new_rows_nat[:, NATURAL_ORDER]
    want_delta = (native.block_ac_histograms(new_zz).sum(axis=0)
                  - perblock[touched].sum(axis=0))
    got_delta = native.delta_hist(perblock, touched, new_rows_nat)
    assert np.array_equal(got_delta, want_delta)

    base = hstats.new_histogram()
    base[:256] += perblock.sum(axis=0)
    pb_copy = perblock.copy()
    native.commit_hist(pb_copy, touched, new_rows_nat, base)
    assert np.array_equal(pb_copy[touched],
                          native.block_ac_histograms(new_zz))
    expect_base = hstats.new_histogram()
    expect_base[:256] += pb_copy.sum(axis=0)
    assert np.array_equal(base[:256], expect_base[:256])


def test_global_order_parity(rng):
    from guetzli_tpu.search.processor import Processor
    n, steps = 97, 64
    cand_err = rng.random((n, steps)).astype(np.float32) * 3
    cand_count = rng.integers(0, steps + 1, n).astype(np.int64)
    last_indexes = np.minimum(rng.integers(0, steps, n), cand_count)
    block_weight = np.where(rng.random(n) < 0.3, 0.0,
                            rng.random(n)).astype(np.float32)
    max_block_error = (rng.random(n) * 2).astype(np.float64)
    for direction in (1, -1):
        gb, gv, btc = native.global_order(
            cand_err, cand_count, last_indexes, block_weight,
            max_block_error, direction)
        wb, wv, wbtc = Processor._build_global_order(
            direction, block_weight, cand_err, cand_count, last_indexes,
            max_block_error)
        order = np.argsort(wv, kind="stable")
        wb, wv = wb[order], wv[order]
        assert wbtc == btc
        assert np.array_equal(np.sort(gv), np.sort(wv))
        # value-equal entries may tie-break differently; compare as
        # (value, block) multisets
        assert sorted(zip(gv, gb)) == sorted(zip(wv, wb))


@pytest.mark.parametrize("subsampling,strip", [(0, True), (2, True),
                                               (0, False)])
def test_serialize_byte_parity(bees_rgb, monkeypatch, subsampling, strip):
    jb = _make_jpeg(bees_rgb, quality=93, subsampling=subsampling)
    jpg = reader.parse(jb)
    with_native = writer.serialize(jpg, strip_metadata=strip)
    _force_python(monkeypatch)
    pure_python = writer.serialize(jpg, strip_metadata=strip)
    assert with_native == pure_python


def test_pack_bits_rejects_oversized_lengths():
    # gtpu_pack_bits carries up to 7 bits between entries; lengths > 57
    # would overflow the 64-bit buffer (UB) and must be rejected.
    vals = np.array([1], dtype=np.int64)
    lens = np.array([60], dtype=np.int32)
    out = np.zeros(64, dtype=np.uint8)
    import ctypes
    lib = native._load()
    rc = lib.gtpu_pack_bits(native._i64p(vals),
                            native._i32p(lens), 1,
                            out.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_uint8)), 64)
    assert rc == -2
