"""Canonical JPEG Huffman codes: decode LUT + length-limited tree builder.

Decode side uses a single flat 16-bit lookup table per Huffman table (peek 16
bits -> (symbol, code length)); simpler than the reference's two-level LUT
(guetzli/jpeg_huffman_decode.cc:42-122) and a good fit for numpy construction.
Encode side implements the optimal length-limited (16-bit) Huffman code
construction used for JPEG DHT emission (reference guetzli/entropy_encode.cc).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from guetzli_tpu.jpeg.error import JpegDecodeError, JpegError

MAX_BIT_LENGTH = 16
ALPHABET_SIZE = 256
# Sentinel symbol assigned the all-ones code so that a walk off the real code
# tree decodes to an invalid symbol instead of reading garbage (the reference
# does the same, guetzli/jpeg_data_reader.cc:313-315).
INVALID_SYMBOL = 256


def validate_counts(counts: np.ndarray, is_ac: bool) -> int:
    """Checks code-space feasibility; returns remaining (unused) code space
    in 1/65536 units. Raises on overfull codes."""
    space = 1 << MAX_BIT_LENGTH
    for i in range(1, MAX_BIT_LENGTH + 1):
        space -= int(counts[i]) << (MAX_BIT_LENGTH - i)
    if space < 0:
        raise JpegDecodeError(JpegError.INVALID_HUFFMAN_CODE,
                              "overfull Huffman code")
    return space


def build_decode_lut(counts: np.ndarray, values: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Builds a flat 2^16-entry decode LUT.

    counts: length-17 histogram including the sentinel added at max depth.
    values: symbols by increasing code length, sentinel (=256) last.
    Returns (symbols[65536] int16 with -1 = invalid, lengths[65536] uint8).
    """
    lut_sym = np.full(1 << MAX_BIT_LENGTH, -1, dtype=np.int32)
    lut_len = np.zeros(1 << MAX_BIT_LENGTH, dtype=np.uint8)
    code = 0
    vi = 0
    for length in range(1, MAX_BIT_LENGTH + 1):
        for _ in range(int(counts[length])):
            sym = int(values[vi])
            vi += 1
            lo = code << (MAX_BIT_LENGTH - length)
            hi = (code + 1) << (MAX_BIT_LENGTH - length)
            lut_sym[lo:hi] = sym
            lut_len[lo:hi] = length
            code += 1
        code <<= 1
    return lut_sym, lut_len


def counts_with_sentinel(counts: np.ndarray, values: np.ndarray,
                         total_count: int) -> Tuple[np.ndarray, np.ndarray]:
    """Appends the invalid sentinel symbol at the deepest used length."""
    counts = np.asarray(counts, dtype=np.int32).copy()
    values = np.asarray(values, dtype=np.int32).copy()
    nz = np.nonzero(counts[1:])[0]
    max_depth = int(nz[-1]) + 1 if nz.size else 1
    counts[max_depth] += 1
    values[total_count] = INVALID_SYMBOL
    return counts, values


# ---------------------------------------------------------------------------
# Optimal length-limited Huffman code construction (encode side).
# Package-merge-free approach: build an unconstrained Huffman tree; if its
# depth exceeds the limit, redo with counts scaled down (count = count//2 + 1)
# until it fits. Same convergence strategy as the reference
# (guetzli/entropy_encode.cc:76-147), standard in Brotli-family coders.
# ---------------------------------------------------------------------------

def _tree_depths(hist: np.ndarray) -> np.ndarray:
    """Unconstrained Huffman code lengths for symbols with hist>0 (ties broken
    toward shallow trees by preferring lower symbol index / earlier nodes)."""
    import heapq

    n = len(hist)
    heap = []
    serial = 0
    # (weight, tiebreak, node). Leaf node = ('L', sym); internal = ('I', l, r)
    for sym in range(n):
        if hist[sym] > 0:
            heap.append((int(hist[sym]), serial, ('L', sym)))
            serial += 1
    heapq.heapify(heap)
    depths = np.zeros(n, dtype=np.int32)
    if not heap:
        return depths
    if len(heap) == 1:
        depths[heap[0][2][1]] = 1
        return depths
    while len(heap) > 1:
        w1, _, n1 = heapq.heappop(heap)
        w2, _, n2 = heapq.heappop(heap)
        heapq.heappush(heap, (w1 + w2, serial, ('I', n1, n2)))
        serial += 1

    def assign(node, d):
        stack = [(node, d)]
        while stack:
            nd, dd = stack.pop()
            if nd[0] == 'L':
                depths[nd[1]] = dd
            else:
                stack.append((nd[1], dd + 1))
                stack.append((nd[2], dd + 1))

    assign(heap[0][2], 0)
    return depths


def build_huffman_code_lengths(histogram: np.ndarray,
                               limit: int = MAX_BIT_LENGTH) -> np.ndarray:
    """Depth assignment for a canonical Huffman code, max depth `limit`."""
    hist = np.asarray(histogram, dtype=np.int64).copy()
    while True:
        depths = _tree_depths(hist)
        if depths.max(initial=0) <= limit:
            return depths
        # Flatten the distribution and retry (halving preserves optimality
        # well in practice and terminates quickly).
        nz = hist > 0
        hist[nz] = hist[nz] // 2 + 1


def depths_to_canonical(depths: np.ndarray
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(counts[17], values, codes) canonical code from per-symbol depths.

    codes is indexed by symbol; symbols with depth 0 get code 0/len 0.
    """
    n = len(depths)
    counts = np.zeros(MAX_BIT_LENGTH + 1, dtype=np.int32)
    for d in depths:
        if d > 0:
            counts[d] += 1
    order = sorted((int(d), s) for s, d in enumerate(depths) if d > 0)
    values = np.array([s for _, s in order], dtype=np.int32)
    codes = np.zeros(n, dtype=np.uint32)
    code = 0
    prev_len = 0
    for d, s in order:
        code <<= (d - prev_len)
        codes[s] = code
        code += 1
        prev_len = d
    return counts, values, codes
