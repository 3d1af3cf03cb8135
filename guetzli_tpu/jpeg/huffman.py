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
# Behavior-identical to the reference's builder (the brotli-style two-queue
# merge with count-limit doubling, guetzli/entropy_encode.cc:76-147) so that
# emitted DHT tables — and therefore whole output files — match byte-for-byte.
# ---------------------------------------------------------------------------

def build_huffman_code_lengths(histogram: np.ndarray,
                               limit: int = MAX_BIT_LENGTH) -> np.ndarray:
    """Depth assignment for a canonical Huffman code, max depth `limit`.

    Tie-breaking matches the reference: leaves ordered by (count asc,
    symbol desc); on equal counts a leaf is merged before an internal node.
    Depth overflow is resolved by clamping counts to a doubling lower bound
    and retrying.
    """
    from guetzli_tpu import native
    if native.available():
        return native.huffman_depths(histogram, limit)
    hist = np.asarray(histogram, dtype=np.int64)
    n_syms = len(hist)
    depths = np.zeros(n_syms, dtype=np.int32)
    count_limit = 1
    while True:
        # Leaves sorted by (count asc, symbol desc).
        leaves = sorted(((max(int(hist[s]), count_limit), -s)
                         for s in range(n_syms) if hist[s] > 0),
                        key=lambda t: (t[0], t[1]))
        if not leaves:
            return depths
        if len(leaves) == 1:
            depths[:] = 0
            depths[-leaves[0][1]] = 1
            return depths
        # Two-queue merge: sorted leaf queue + FIFO internal-node queue;
        # a leaf wins ties (<=). Nodes: (count, left, right) or (count, sym).
        leaf_nodes = [(w, ('L', -negsym)) for w, negsym in leaves]
        internal = []
        li = ii = 0

        def take():
            nonlocal li, ii
            lw = leaf_nodes[li][0] if li < len(leaf_nodes) else None
            iw = internal[ii][0] if ii < len(internal) else None
            if iw is None or (lw is not None and lw <= iw):
                li += 1
                return leaf_nodes[li - 1]
            ii += 1
            return internal[ii - 1]

        for _ in range(len(leaf_nodes) - 1):
            a = take()
            b = take()
            internal.append((a[0] + b[0], ('I', a[1], b[1])))

        depths[:] = 0
        ok = True
        stack = [(internal[-1][1], 0)]
        while stack:
            node, d = stack.pop()
            if node[0] == 'L':
                if d > limit:
                    ok = False
                    break
                depths[node[1]] = d
            else:
                stack.append((node[1], d + 1))
                stack.append((node[2], d + 1))
        if ok:
            return depths
        count_limit *= 2


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
