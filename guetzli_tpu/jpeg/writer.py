"""JPEG serializer: emits a sequential (SOF1) JPEG with per-image optimal
clustered Huffman tables.

Byte-compatible with the reference writer (guetzli/jpeg_data_writer.cc:540):
same segment order (SOI, metadata, DQT, SOF1, combined DHT+SOS, scan, EOI,
tail), same histogram clustering and canonical code construction, same
padding/stuffing — so identical JPEGData serializes to identical bytes.

The entropy scan is assembled with vectorized numpy bit packing instead of a
per-symbol loop: the whole (code,length) stream is expanded to a bit matrix
and packed with np.packbits, then 0xFF-stuffed in one pass.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from guetzli_tpu.entropy import histogram as hstats
from guetzli_tpu.jpeg import huffman
from guetzli_tpu.jpeg.data import JPEGData, NATURAL_ORDER


def _cluster_histograms(histos: List[np.ndarray]
                        ) -> Tuple[List[np.ndarray], List[int],
                                   List[np.ndarray], int]:
    """Greedy merge of the trailing histogram pair while it reduces total
    (header + entropy) cost; reference guetzli/jpeg_data_writer.cc:295-342.

    Returns (clustered histograms, per-input cluster index, per-cluster code
    depths, total cost bytes)."""
    from guetzli_tpu import native
    if native.available():
        clustered, indexes, depths = native.cluster_full(histos)
        total = sum(hstats.histogram_header_cost(h)
                    + hstats.histogram_entropy_cost(h, d)
                    for h, d in zip(clustered, depths))
        return clustered, indexes, depths, (total + 7) // 8
    histos = [h.copy() for h in histos]
    n = len(histos)
    indexes = list(range(n))
    depths = [huffman.build_huffman_code_lengths(h) for h in histos]
    costs = [hstats.histogram_header_cost(h)
             + hstats.histogram_entropy_cost(h, d)
             for h, d in zip(histos, depths)]
    num = n
    while num > 1:
        last, second = num - 1, num - 2
        combined = hstats.add_histograms(histos[last], histos[second])
        d = huffman.build_huffman_code_lengths(combined)
        cost = (hstats.histogram_header_cost(combined)
                + hstats.histogram_entropy_cost(combined, d))
        if cost < costs[last] + costs[second]:
            histos[second] = combined
            histos[last] = hstats.new_histogram()
            costs[second] = cost
            depths[second] = d
            for i in range(n):
                if indexes[i] == last:
                    indexes[i] = second
            num -= 1
        else:
            break
    total = sum(costs[:num])
    return histos[:num], indexes, depths[:num], (total + 7) // 8


def cluster_histograms_cost(histos: List[np.ndarray]) -> int:
    """In-loop size estimate: clustered cost in bytes for a histogram set."""
    return _cluster_histograms(histos)[3]


def estimate_jpeg_data_size(histograms: List[np.ndarray]) -> int:
    """DHT + entropy bytes for (DC histos + AC histos) of all components
    (reference guetzli/jpeg_data_writer.cc:344-355)."""
    ncomp = len(histograms) // 2
    return (cluster_histograms_cost(histograms[:ncomp])
            + cluster_histograms_cost(histograms[ncomp:]))


def _encode_dqt(quant) -> bytes:
    payload = bytearray()
    for t in quant:
        payload.append((t.precision << 4) + t.index)
        vals = t.values[NATURAL_ORDER]
        for v in vals:
            v = int(v)
            if t.precision:
                payload.append(v >> 8)
            payload.append(v & 0xFF)
    marker_len = 2 + len(payload)
    return bytes([0xFF, 0xDB, marker_len >> 8, marker_len & 0xFF]) + payload


def _encode_sof(jpg: JPEGData) -> bytes:
    ncomps = len(jpg.components)
    marker_len = 8 + 3 * ncomps
    out = bytearray([0xFF, 0xC1, marker_len >> 8, marker_len & 0xFF, 8,
                     jpg.height >> 8, jpg.height & 0xFF,
                     jpg.width >> 8, jpg.width & 0xFF, ncomps])
    for c in jpg.components:
        out += bytes([c.id, (c.h_samp_factor << 4) | c.v_samp_factor,
                      jpg.quant[c.quant_idx].index])
    return bytes(out)


def _encode_metadata(jpg: JPEGData, strip: bool) -> bytes:
    if strip:
        # Canned JFIF v1.01 APP0, same bytes the reference substitutes.
        return bytes([0xFF, 0xE0, 0x00, 0x10,
                      0x4A, 0x46, 0x49, 0x46, 0x00,
                      0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00])
    out = bytearray()
    for a in jpg.app_data:
        out += b"\xff" + a
    for c in jpg.com_data:
        out += b"\xff\xfe" + c
    return bytes(out)


def _dht_payload(depths: np.ndarray, slot: int) -> Tuple[bytes, np.ndarray]:
    """DHT table bytes for one code + per-symbol code values.

    Drops the sentinel (deepest, last) symbol from the emitted counts, as
    the format's all-ones code must stay unused."""
    counts, values, codes = huffman.depths_to_canonical(depths)
    counts = counts.copy()
    max_len = int(np.max(np.nonzero(counts)[0])) if counts.any() else 0
    counts[max_len] -= 1
    total = int(np.sum(counts))
    out = bytearray([slot])
    out += bytes(int(counts[j]) for j in range(1, 17))
    out += bytes(int(v) for v in values[:total])
    return bytes(out), codes


def _pack_bits(values: np.ndarray, lengths: np.ndarray) -> bytearray:
    """MSB-first concatenation of variable-length codes, final partial byte
    padded with 1s, 0xFF bytes stuffed with a following 0x00."""
    total_bits = int(lengths.sum())
    pad = (-total_bits) % 8
    if pad:
        values = np.concatenate([values, [np.int64((1 << pad) - 1)]])
        lengths = np.concatenate([lengths, [np.int64(pad)]])
        total_bits += pad
    ends = np.cumsum(lengths)
    starts = ends - lengths
    maxlen = int(lengths.max()) if len(lengths) else 0
    # bit j (MSB-first) of each entry -> absolute position starts[i] + j
    bits = np.zeros(total_bits, dtype=np.uint8)
    for j in range(maxlen):
        sel = lengths > j
        shift = (lengths[sel] - 1 - j).astype(np.int64)
        bits[starts[sel] + j] = (values[sel] >> shift) & 1
    packed = np.packbits(bits)
    # 0xFF stuffing.
    ff = np.nonzero(packed == 0xFF)[0]
    if len(ff):
        packed = np.insert(packed, ff + 1, 0)
    return bytearray(packed.tobytes())


def _encode_scan(jpg: JPEGData, streams, dc_codes, ac_codes,
                 dc_depths, ac_depths) -> bytes:
    """Entropy-coded scan data: interleave per-component symbol streams in
    MCU block order, map to (code,len) pairs, pack."""
    ncomp = len(jpg.components)
    max_hv = max(c.h_samp_factor * c.v_samp_factor for c in jpg.components)
    values_parts = []
    lengths_parts = []
    keys_parts = []
    for ci, (comp, s) in enumerate(zip(jpg.components, streams)):
        dcd = dc_depths[ci].astype(np.int64)
        dcc = dc_codes[ci].astype(np.int64)
        acd = ac_depths[ci].astype(np.int64)
        acc = ac_codes[ci].astype(np.int64)
        # DC entry per block: huffman code ++ magnitude bits.
        d_len = dcd[s.dc_symbols] + s.dc_magnbits
        d_val = (dcc[s.dc_symbols] << s.dc_magnbits) | s.dc_magbits
        # AC entries.
        a_len = acd[s.ac_symbols] + s.ac_magnbits
        a_val = (acc[s.ac_symbols] << s.ac_magnbits) | s.ac_magbits
        # Global ordering key: (block position in MCU traversal, comp order,
        # DC-before-AC, original index). Block positions must compare across
        # components: block i of this component occupies global MCU slot
        # based on the shared MCU grid. Each MCU contains h*v blocks of this
        # component; the traversal-ordered block index i belongs to MCU
        # i // (h*v). Within an MCU components are visited in order, and
        # within a component its h*v blocks in sequence.
        hv = comp.h_samp_factor * comp.v_samp_factor
        n_blocks = len(s.dc_symbols)
        blk = np.arange(n_blocks, dtype=np.int64)
        mcu = blk // hv
        within = blk % hv
        # key layout: mcu * (big) + comp-slot ordering
        slot = mcu * (ncomp * max_hv) + ci * max_hv + within
        d_key = slot * 2            # DC first within block
        a_key = slot[s.ac_block_id] * 2 + 1
        values_parts += [d_val, a_val]
        lengths_parts += [d_len, a_len]
        keys_parts += [d_key, a_key]
    values = np.concatenate(values_parts)
    lengths = np.concatenate(lengths_parts)
    keys = np.concatenate(keys_parts)
    order = np.argsort(keys, kind="stable")
    return bytes(_pack_bits(values[order], lengths[order]))


def serialize(jpg: JPEGData, strip_metadata: bool = True) -> bytes:
    """JPEGData -> complete JPEG byte stream."""
    from guetzli_tpu import native
    use_native = native.available()
    ncomp = len(jpg.components)

    zz_list = []
    for comp in jpg.components:
        order = hstats.mcu_block_order(comp, jpg)
        zz_list.append(np.ascontiguousarray(
            comp.coeffs[order][:, NATURAL_ORDER], dtype=np.int32))

    if use_native:
        streams = None
        dc_histos, ac_histos = [], []
        for zz in zz_list:
            dch, ach = native.component_histograms(zz)
            dc_histos.append(dch)
            ac_histos.append(ach)
    else:
        streams = [hstats.component_symbol_stream(zz) for zz in zz_list]
        dc_histos = hstats.build_dc_histograms(jpg, streams)
        ac_histos = hstats.build_ac_histograms(jpg, streams)
    _, dc_idx, dc_cl_depths, _ = _cluster_histograms(dc_histos)
    _, ac_idx, ac_cl_depths, _ = _cluster_histograms(ac_histos)

    # DHT payloads + per-component code tables.
    dht = bytearray()
    dc_codes: List[Optional[np.ndarray]] = [None] * ncomp
    ac_codes: List[Optional[np.ndarray]] = [None] * ncomp
    dc_depths: List[Optional[np.ndarray]] = [None] * ncomp
    ac_depths: List[Optional[np.ndarray]] = [None] * ncomp
    for i, d in enumerate(dc_cl_depths):
        payload, codes = _dht_payload(d, i)
        dht += payload
        for c in range(ncomp):
            if dc_idx[c] == i:
                dc_codes[c] = codes
                dc_depths[c] = d
    for i, d in enumerate(ac_cl_depths):
        payload, codes = _dht_payload(d, i + 0x10)
        dht += payload
        for c in range(ncomp):
            if ac_idx[c] == i:
                ac_codes[c] = codes
                ac_depths[c] = d
    dht_marker_len = 2 + len(dht)
    dht_seg = bytes([0xFF, 0xC4, dht_marker_len >> 8,
                     dht_marker_len & 0xFF]) + bytes(dht)

    sos_marker_len = 6 + 2 * ncomp
    sos = bytearray([0xFF, 0xDA, sos_marker_len >> 8, sos_marker_len & 0xFF,
                     ncomp])
    for c in range(ncomp):
        sos += bytes([jpg.components[c].id,
                      (dc_idx[c] << 4) | ac_idx[c]])
    sos += bytes([0, 63, 0])

    if use_native:
        scan = native.encode_scan(
            zz_list,
            [c.h_samp_factor * c.v_samp_factor for c in jpg.components],
            dc_codes, dc_depths, ac_codes, ac_depths)
    else:
        scan = _encode_scan(jpg, streams, dc_codes, ac_codes,
                            dc_depths, ac_depths)

    out = bytearray(b"\xff\xd8")
    out += _encode_metadata(jpg, strip_metadata)
    out += _encode_dqt(jpg.quant)
    out += _encode_sof(jpg)
    out += dht_seg
    out += bytes(sos)
    out += scan
    out += b"\xff\xd9"
    if not strip_metadata:
        out += jpg.tail_data
    return bytes(out)
