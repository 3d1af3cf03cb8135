"""JPEG symbol statistics: histograms, traversal order, vectorized symbol
streams.

Replaces the reference's per-coefficient C++ loops
(guetzli/jpeg_data_writer.cc:188-266) with numpy-vectorized generation of the
(symbol, magnitude-bits) stream for whole components at once; the same stream
feeds both the histogram builder and the bitstream assembler, so file size ==
sum of code lengths by construction.

Histogram convention (kept because the cost model depends on it, reference
guetzli/jpeg_data_writer.h:57-86): 257 bins; every real symbol counts twice;
bin 256 permanently holds 1 and becomes the all-ones sentinel code.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from guetzli_tpu.jpeg.data import JPEGData, NATURAL_ORDER

HIST_SIZE = 257  # 256 symbols + sentinel


def new_histogram() -> np.ndarray:
    h = np.zeros(HIST_SIZE, dtype=np.int64)
    h[HIST_SIZE - 1] = 1
    return h


def add_histograms(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    out = a + b
    out[HIST_SIZE - 1] = 1
    return out


def num_symbols(hist: np.ndarray) -> int:
    return int(np.count_nonzero(hist[:-1]))


def mcu_block_order(comp, jpg: JPEGData) -> np.ndarray:
    """Indices of a component's blocks in MCU (interleaved scan) traversal
    order. For 1x1 sampling this is the identity."""
    v, h = comp.v_samp_factor, comp.h_samp_factor
    rows, cols = jpg.MCU_rows, jpg.MCU_cols
    idx = np.arange(comp.num_blocks, dtype=np.int64).reshape(
        rows * v, cols * h)
    # (rows, v, cols, h) -> (rows, cols, v, h)
    return idx.reshape(rows, v, cols, h).transpose(0, 2, 1, 3).reshape(-1)


def nbits_for(values: np.ndarray) -> np.ndarray:
    """JPEG magnitude category: bit length of |v| (0 for v == 0)."""
    a = np.abs(values.astype(np.int64))
    return np.where(a > 0, np.floor(np.log2(np.maximum(a, 1))).astype(
        np.int64) + 1, 0)


@dataclasses.dataclass
class SymbolStream:
    """Per-component symbol stream in traversal order.

    dc_symbols: (N,) magnitude category per block (= the DC Huffman symbol)
    dc_magbits/dc_magnbits: value bits appended after the DC code
    ac_symbols: (M,) AC Huffman symbols (ZRL=0xF0 / EOB=0 included)
    ac_magbits/ac_magnbits: value bits per AC symbol (0 bits for ZRL/EOB)
    ac_block_id: (M,) owning block (traversal position) per AC symbol
    """

    dc_symbols: np.ndarray
    dc_magbits: np.ndarray
    dc_magnbits: np.ndarray
    ac_symbols: np.ndarray
    ac_magbits: np.ndarray
    ac_magnbits: np.ndarray
    ac_block_id: np.ndarray


def _magnitude_bits(v: np.ndarray, nbits: np.ndarray) -> np.ndarray:
    """JPEG signed magnitude encoding: v for v>=0 else v-1, masked to nbits
    (ITU T.81 tables F.1/F.2)."""
    raw = np.where(v >= 0, v, v - 1).astype(np.int64)
    return (raw & ((1 << nbits) - 1)).astype(np.int64)


def component_symbol_stream(zz_ordered: np.ndarray) -> SymbolStream:
    """Builds the full sequential-mode symbol stream for one component.

    zz_ordered: (N, 64) int coefficients, already in traversal order, zigzag
    sequence within each row (i.e. coeffs[:, NATURAL_ORDER]).
    """
    zz = zz_ordered.astype(np.int64)
    n_blocks = zz.shape[0]

    # --- DC: difference coding along the traversal ---
    dc = zz[:, 0]
    dc_diff = np.diff(dc, prepend=0)
    dc_nbits = nbits_for(dc_diff)
    dc_magbits = _magnitude_bits(dc_diff, dc_nbits)

    # --- AC: run-length/magnitude symbols ---
    ac = zz[:, 1:]
    rows, ks = np.nonzero(ac)          # ascending (block, k) — scan order
    vals = ac[rows, ks]
    k_pos = ks + 1                     # actual zigzag index 1..63

    # Zero-run before each nonzero coeff within its block.
    first_in_row = np.ones(len(rows), dtype=bool)
    first_in_row[1:] = rows[1:] != rows[:-1]
    prev_k = np.empty_like(k_pos)
    prev_k[0:] = 0
    if len(rows) > 1:
        prev_k[1:] = np.where(first_in_row[1:], 0, k_pos[:-1])
    run = k_pos - prev_k - 1

    n_zrl = run >> 4                   # ZRL (0xF0) symbols emitted before
    r = run & 15
    v_nbits = nbits_for(vals)
    sym = (r << 4) | v_nbits
    magbits = _magnitude_bits(vals, v_nbits)

    # EOB for blocks whose last nonzero isn't at position 63.
    last_k = np.zeros(n_blocks, dtype=np.int64)
    if len(rows):
        # rows ascending -> the last entry per row has the max k.
        last_idx_per_row = np.searchsorted(rows, np.arange(n_blocks),
                                           side="right") - 1
        has_any = last_idx_per_row >= np.searchsorted(
            rows, np.arange(n_blocks), side="left")
        last_k[has_any] = k_pos[last_idx_per_row[has_any]]
    needs_eob = last_k < 63

    # Entry expansion: per nonzero coeff -> n_zrl ZRL entries + 1 symbol.
    cnt = n_zrl + 1
    offsets = np.zeros(len(cnt) + 1, dtype=np.int64)
    np.cumsum(cnt, out=offsets[1:])
    total = int(offsets[-1])
    ac_symbols = np.full(total, 0xF0, dtype=np.int64)
    ac_magbits_arr = np.zeros(total, dtype=np.int64)
    ac_magnbits = np.zeros(total, dtype=np.int64)
    ac_block = np.repeat(rows, cnt)
    sym_pos = offsets[1:] - 1          # symbol goes after its ZRLs
    ac_symbols[sym_pos] = sym
    ac_magbits_arr[sym_pos] = magbits
    ac_magnbits[sym_pos] = v_nbits

    # Append EOB entries; ordering by (block, original position) is restored
    # by a stable sort, EOBs keyed to sort after the block's AC entries.
    eob_blocks = np.nonzero(needs_eob)[0].astype(np.int64)
    ac_symbols = np.concatenate([ac_symbols,
                                 np.zeros(len(eob_blocks), dtype=np.int64)])
    ac_magbits_arr = np.concatenate(
        [ac_magbits_arr, np.zeros(len(eob_blocks), dtype=np.int64)])
    ac_magnbits = np.concatenate(
        [ac_magnbits, np.zeros(len(eob_blocks), dtype=np.int64)])
    ac_block = np.concatenate([ac_block, eob_blocks])
    order = np.argsort(ac_block, kind="stable")

    return SymbolStream(
        dc_symbols=dc_nbits, dc_magbits=dc_magbits, dc_magnbits=dc_nbits,
        ac_symbols=ac_symbols[order], ac_magbits=ac_magbits_arr[order],
        ac_magnbits=ac_magnbits[order], ac_block_id=ac_block[order])


def component_streams(jpg: JPEGData) -> List[SymbolStream]:
    """Symbol streams for every component in MCU traversal order."""
    streams = []
    for comp in jpg.components:
        order = mcu_block_order(comp, jpg)
        zz = comp.coeffs[order][:, NATURAL_ORDER]
        streams.append(component_symbol_stream(zz))
    return streams


def build_dc_histograms(jpg: JPEGData,
                        streams: List[SymbolStream]) -> List[np.ndarray]:
    out = []
    for s in streams:
        h = new_histogram()
        np.add.at(h, s.dc_symbols, 2)
        out.append(h)
    return out


def build_ac_histograms(jpg: JPEGData,
                        streams: List[SymbolStream]) -> List[np.ndarray]:
    out = []
    for s in streams:
        h = new_histogram()
        np.add.at(h, s.ac_symbols, 2)
        out.append(h)
    return out


def histogram_header_cost(hist: np.ndarray) -> int:
    """DHT segment bits for this table (reference
    guetzli/jpeg_data_writer.cc:211-219)."""
    return 17 * 8 + 8 * int(np.count_nonzero(hist[:-1]))


def histogram_entropy_cost(hist: np.ndarray, depths: np.ndarray) -> int:
    """Entropy-coded bits under the given code depths, including magnitude
    bits (i & 0xf) and the 0.75/256 escape-byte fudge (reference
    guetzli/jpeg_data_writer.cc:221-232)."""
    syms = np.arange(256, dtype=np.int64)
    bits = int(np.sum((hist[:256] // 2) * (depths[:256] + (syms & 0xF))))
    bits += (bits * 3 + 512) >> 10
    return bits


def jpeg_header_size(jpg: JPEGData, strip_metadata: bool) -> int:
    """Byte size of all non-entropy, non-DHT-payload parts (reference
    guetzli/jpeg_data_writer.cc:269-293)."""
    n = 2  # SOI
    if strip_metadata:
        n += 18
    else:
        n += sum(1 + len(a) for a in jpg.app_data)
        n += sum(2 + len(c) for c in jpg.com_data)
    n += 4 + sum(1 + (2 if q.precision else 1) * 64 for q in jpg.quant)
    n += 10 + 3 * len(jpg.components)  # SOF
    n += 4                             # DHT shell
    n += 8 + 2 * len(jpg.components)   # SOS
    n += 2                             # EOI
    n += len(jpg.tail_data)
    return n
