"""JPEG parser: markers + sequential/progressive entropy decode.

Host-side (never on TPU). Produces a JPEGData whose coefficient arrays feed
the device pipeline. Validation surface mirrors the reference parser
(guetzli/jpeg_data_reader.cc:931-1079): same error taxonomy, same structural
limits (<=2^21 blocks/component), same tolerance for inter-marker garbage.

A C fast path (guetzli_tpu.jpeg._native) handles scan entropy decode when
built; this module is the always-available pure-Python implementation.
"""

from __future__ import annotations

import enum
from typing import List, Optional

import numpy as np

from guetzli_tpu.jpeg import huffman
from guetzli_tpu.jpeg.data import (Component, ComponentScanInfo, HuffmanCode,
                                   JPEGData, NATURAL_ORDER, QuantTable,
                                   ScanInfo, DC_ALPHABET_SIZE,
                                   HUFFMAN_ALPHABET_SIZE, MAX_COMPONENTS,
                                   MAX_DHT_MARKERS, MAX_QUANT_TABLES)
from guetzli_tpu.jpeg.error import JpegDecodeError, JpegError


class ReadMode(enum.Enum):
    HEADER = 0   # stop after SOF
    TABLES = 1   # everything except scans / APP / COM payload capture
    ALL = 2      # full entropy decode


MAX_BLOCKS_PER_COMPONENT = 1 << 21  # ~1 GB of int16 coeffs; reference cap


def _err(code: JpegError, msg: str = "") -> JpegDecodeError:
    return JpegDecodeError(code, msg)


class BitReader:
    """Bit reader over entropy-coded data with 0xFF00 unstuffing.

    Reads past the next marker yield zero bytes (tracked so finish() can
    detect overconsumption) — same contract as the reference's
    BitReaderState (guetzli/jpeg_data_reader.cc:425-505).
    """

    __slots__ = ("data", "length", "pos", "val", "bits_left",
                 "next_marker_pos")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.length = len(data)
        self.reset(pos)

    def reset(self, pos: int) -> None:
        self.pos = pos
        self.val = 0
        self.bits_left = 0
        self.next_marker_pos = self.length - 2
        self.fill()

    def _next_byte(self) -> int:
        if self.pos >= self.next_marker_pos:
            self.pos += 1
            return 0
        c = self.data[self.pos]
        self.pos += 1
        if c == 0xFF:
            escape = self.data[self.pos] if self.pos < self.length else 0
            if escape == 0:
                self.pos += 1
            else:
                self.next_marker_pos = self.pos - 1
        return c

    def fill(self) -> None:
        if self.bits_left <= 16:
            while self.bits_left <= 56:
                self.val = ((self.val << 8) | self._next_byte()) \
                    & 0xFFFFFFFFFFFFFFFF
                self.bits_left += 8

    def read_bits(self, nbits: int) -> int:
        self.fill()
        v = (self.val >> (self.bits_left - nbits)) & ((1 << nbits) - 1)
        self.bits_left -= nbits
        return v

    def peek16(self) -> int:
        self.fill()
        return (self.val >> (self.bits_left - 16)) & 0xFFFF

    def skip_bits(self, nbits: int) -> None:
        self.bits_left -= nbits

    def finish(self) -> int:
        """Returns the resume position, giving back whole unused bytes.
        Raises if the scan consumed past the next marker."""
        unused = self.bits_left >> 3
        pos = self.pos
        for _ in range(unused):
            pos -= 1
            if (pos < self.next_marker_pos and self.data[pos] == 0
                    and self.data[pos - 1] == 0xFF):
                pos -= 1
        if pos > self.next_marker_pos:
            raise _err(JpegError.INVALID_SCAN, "unexpected end of scan")
        return pos


def _huff_extend(x: int, s: int) -> int:
    # Tables F.1/F.2 of ITU T.81.
    return x - (1 << s) + 1 if x < (1 << (s - 1)) else x


class _DecodeTables:
    """Per-slot flat decode LUTs (4 DC + 4 AC slots)."""

    def __init__(self):
        self.dc: List[Optional[tuple]] = [None] * 4
        self.ac: List[Optional[tuple]] = [None] * 4


def _read_symbol(lut: tuple, br: BitReader) -> int:
    lut_sym, lut_len = lut
    idx = br.peek16()
    sym = int(lut_sym[idx])
    br.skip_bits(int(lut_len[idx]))
    return sym


def _signed_leftshift(v: int, s: int) -> int:
    return v << s if v >= 0 else -((-v) << s)


def _decode_dct_block(dc_lut, ac_lut, Ss, Se, Al, state, br: BitReader,
                      coeffs: np.ndarray, comp_idx: int) -> None:
    """First-pass (Ah==0) block decode; sequential is Ss=0,Se=63,Al=0."""
    eobrun_allowed = Ss > 0
    if Ss == 0:
        s = _read_symbol(dc_lut, br)
        if s >= DC_ALPHABET_SIZE or s < 0:
            raise _err(JpegError.INVALID_SYMBOL, f"DC symbol {s}")
        if s > 0:
            s = _huff_extend(br.read_bits(s), s)
        s += state['last_dc'][comp_idx]
        dc = _signed_leftshift(s, Al)
        if not (-32768 <= dc <= 32767):
            raise _err(JpegError.NON_REPRESENTABLE_DC_COEFF, str(dc))
        coeffs[0] = dc
        state['last_dc'][comp_idx] = s
        Ss = 1
    if Ss > Se:
        return
    if state['eobrun'] > 0:
        state['eobrun'] -= 1
        return
    k = Ss
    while k <= Se:
        s = _read_symbol(ac_lut, br)
        if s >= HUFFMAN_ALPHABET_SIZE or s < 0:
            raise _err(JpegError.INVALID_SYMBOL, f"AC symbol {s} at k={k}")
        r = s >> 4
        s &= 15
        if s > 0:
            k += r
            if k > Se:
                raise _err(JpegError.OUT_OF_BAND_COEFF, f"k={k}")
            if s + Al >= DC_ALPHABET_SIZE:
                raise _err(JpegError.NON_REPRESENTABLE_AC_COEFF,
                           f"s={s} Al={Al}")
            v = _huff_extend(br.read_bits(s), s)
            coeffs[NATURAL_ORDER[k]] = _signed_leftshift(v, Al)
            k += 1
        elif r == 15:
            k += 16
        else:
            state['eobrun'] = 1 << r
            if r > 0:
                if not eobrun_allowed:
                    raise _err(JpegError.EOB_RUN_TOO_LONG,
                               "EOB run crossing DC")
                state['eobrun'] += br.read_bits(r)
            break
    state['eobrun'] -= 1


def _refine_dct_block(ac_lut, Ss, Se, Al, state, br: BitReader,
                      coeffs: np.ndarray) -> None:
    """Successive-approximation refinement pass (Ah>0)."""
    eobrun_allowed = Ss > 0
    if Ss == 0:
        s = br.read_bits(1)
        coeffs[0] = np.int16(coeffs[0] | (s << Al))
        Ss = 1
    if Ss > Se:
        return
    p1, m1 = 1 << Al, -(1 << Al)
    k = Ss
    in_zero_run = False
    if state['eobrun'] <= 0:
        while k <= Se:
            s = _read_symbol(ac_lut, br)
            if s >= HUFFMAN_ALPHABET_SIZE or s < 0:
                raise _err(JpegError.INVALID_SYMBOL, f"AC symbol {s}")
            r = s >> 4
            s &= 15
            if s:
                if s != 1:
                    raise _err(JpegError.INVALID_SYMBOL, f"refine s={s}")
                s = p1 if br.read_bits(1) else m1
                in_zero_run = False
            else:
                if r != 15:
                    state['eobrun'] = 1 << r
                    if r > 0:
                        if not eobrun_allowed:
                            raise _err(JpegError.EOB_RUN_TOO_LONG,
                                       "EOB run crossing DC")
                        state['eobrun'] += br.read_bits(r)
                    break
                in_zero_run = True
            while k <= Se:
                pos = NATURAL_ORDER[k]
                this = int(coeffs[pos])
                if this != 0:
                    if br.read_bits(1):
                        if (this & p1) == 0:
                            this += p1 if this >= 0 else m1
                    coeffs[pos] = this
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if s:
                if k > Se:
                    raise _err(JpegError.OUT_OF_BAND_COEFF, f"k={k}")
                coeffs[NATURAL_ORDER[k]] = s
            k += 1
    if in_zero_run:
        raise _err(JpegError.EXTRA_ZERO_RUN, "")
    if state['eobrun'] > 0:
        while k <= Se:
            pos = NATURAL_ORDER[k]
            this = int(coeffs[pos])
            if this != 0:
                if br.read_bits(1):
                    if (this & p1) == 0:
                        this += p1 if this >= 0 else m1
                coeffs[pos] = this
            k += 1
    state['eobrun'] -= 1


def _find_next_marker(data: bytes, pos: int) -> int:
    """Bytes to skip until the next *valid* marker (reference set:
    guetzli/jpeg_data_reader.cc:913-918)."""
    valid = set(range(0xC0, 0xC3)) | {0xC4} | set(range(0xD0, 0xD8)) \
        | {0xD9, 0xDA, 0xDB, 0xDD} | set(range(0xE0, 0xF0)) | {0xFE}
    # (0xC3 and 0xD8=SOI excluded — same set as the reference's
    #  kIsValidMarker, guetzli/jpeg_data_reader.cc:913-918.)
    n = len(data)
    skipped = 0
    while pos + 1 < n and not (data[pos] == 0xFF and data[pos + 1] in valid):
        pos += 1
        skipped += 1
    return skipped


def parse(data: bytes, mode: ReadMode = ReadMode.ALL) -> JPEGData:
    """Parses a JPEG byte string into JPEGData. Raises JpegDecodeError."""
    jpg = JPEGData()
    try:
        _parse_into(data, mode, jpg)
    except JpegDecodeError as e:
        jpg.error = e.code.name
        raise
    except IndexError as e:
        jpg.error = JpegError.UNEXPECTED_EOF.name
        raise _err(JpegError.UNEXPECTED_EOF, str(e)) from e
    return jpg


def _expect_marker(data: bytes, pos: int) -> None:
    if pos + 2 > len(data) or data[pos] != 0xFF:
        raise _err(JpegError.MARKER_BYTE_NOT_FOUND,
                   f"pos={pos} len={len(data)}")


def _parse_into(data: bytes, mode: ReadMode, jpg: JPEGData) -> None:
    pos = 0
    _expect_marker(data, pos)
    if data[pos + 1] != 0xD8:
        raise _err(JpegError.SOI_NOT_FOUND, f"actual={data[pos + 1]}")
    pos += 2

    tables = _DecodeTables()
    found_sof = False
    is_progressive = False
    scan_progression = np.zeros((MAX_COMPONENTS, 64), dtype=np.uint16)

    while True:
        skipped = _find_next_marker(data, pos)
        if skipped > 0:
            jpg.marker_order.append(0xFF)
            jpg.inter_marker_data.append(data[pos:pos + skipped])
            pos += skipped
        _expect_marker(data, pos)
        marker = data[pos + 1]
        pos += 2

        if marker in (0xC0, 0xC1, 0xC2):
            is_progressive = marker == 0xC2
            pos = _process_sof(data, pos, mode, jpg)
            found_sof = True
        elif marker == 0xC4:
            pos = _process_dht(data, pos, mode, tables, jpg)
        elif 0xD0 <= marker <= 0xD7:
            pass  # bare RST
        elif marker == 0xD9:
            pass  # EOI
        elif marker == 0xDA:
            if mode == ReadMode.ALL:
                pos = _process_scan(data, pos, tables, scan_progression,
                                    is_progressive, jpg)
            # in TABLES/HEADER mode we will hit UNSUPPORTED data next; the
            # reference simply doesn't descend either.
        elif marker == 0xDB:
            pos = _process_dqt(data, pos, jpg)
        elif marker == 0xDD:
            pos = _process_dri(data, pos, jpg)
        elif 0xE0 <= marker <= 0xEF:
            if mode != ReadMode.TABLES:
                pos = _process_app(data, pos, jpg)
        elif marker == 0xFE:
            if mode != ReadMode.TABLES:
                pos = _process_com(data, pos, jpg)
        else:
            raise _err(JpegError.UNSUPPORTED_MARKER, f"marker={marker:#x}")

        jpg.marker_order.append(marker)
        if mode == ReadMode.HEADER and found_sof:
            break
        if marker == 0xD9:
            break

    if not found_sof:
        raise _err(JpegError.SOF_NOT_FOUND, "")

    if mode == ReadMode.ALL:
        if pos < len(data):
            jpg.tail_data = data[pos:]
        _fixup_quant_indexes(jpg)
        if len(jpg.huffman_code) == 0:
            raise _err(JpegError.HUFFMAN_TABLE_ERROR, "no Huffman tables")
        if len(jpg.huffman_code) >= MAX_DHT_MARKERS:
            raise _err(JpegError.HUFFMAN_TABLE_ERROR, "too many tables")


def _read_u16(data: bytes, pos: int) -> int:
    return (data[pos] << 8) | data[pos + 1]


def _verify_len(data, start_pos, marker_len, pos, need):
    if pos + need > len(data):
        raise _err(JpegError.UNEXPECTED_EOF, f"need {need} at {pos}")


def _verify_input(val, lo, hi, code: JpegError):
    if not (lo <= val <= hi):
        raise _err(code, f"value {val} not in [{lo},{hi}]")


def _process_sof(data: bytes, pos: int, mode: ReadMode, jpg: JPEGData) -> int:
    if jpg.width != 0:
        raise _err(JpegError.DUPLICATE_SOF, "")
    start = pos
    marker_len = _read_u16(data, pos)
    precision = data[pos + 2]
    height = _read_u16(data, pos + 3)
    width = _read_u16(data, pos + 5)
    ncomp = data[pos + 7]
    pos += 8
    _verify_input(precision, 8, 8, JpegError.INVALID_PRECISION)
    _verify_input(height, 1, 65535, JpegError.INVALID_HEIGHT)
    _verify_input(width, 1, 65535, JpegError.INVALID_WIDTH)
    _verify_input(ncomp, 1, MAX_COMPONENTS, JpegError.INVALID_NUMCOMP)
    _verify_len(data, start, marker_len, pos, 3 * ncomp)
    jpg.height, jpg.width = height, width

    ids_seen = set()
    for _ in range(ncomp):
        cid = data[pos]
        if cid in ids_seen:
            raise _err(JpegError.DUPLICATE_COMPONENT_ID, str(cid))
        ids_seen.add(cid)
        factor = data[pos + 1]
        h, v = factor >> 4, factor & 0xF
        _verify_input(h, 1, 15, JpegError.INVALID_SAMP_FACTOR)
        _verify_input(v, 1, 15, JpegError.INVALID_SAMP_FACTOR)
        comp = Component(id=cid, h_samp_factor=h, v_samp_factor=v,
                         quant_idx=data[pos + 2])
        jpg.components.append(comp)
        jpg.max_h_samp_factor = max(jpg.max_h_samp_factor, h)
        jpg.max_v_samp_factor = max(jpg.max_v_samp_factor, v)
        pos += 3

    jpg.MCU_rows = -(-jpg.height // (jpg.max_v_samp_factor * 8))
    jpg.MCU_cols = -(-jpg.width // (jpg.max_h_samp_factor * 8))
    if mode == ReadMode.ALL:
        for c in jpg.components:
            if (jpg.max_h_samp_factor % c.h_samp_factor != 0
                    or jpg.max_v_samp_factor % c.v_samp_factor != 0):
                raise _err(JpegError.INVALID_SAMPLING_FACTORS, "")
            c.width_in_blocks = jpg.MCU_cols * c.h_samp_factor
            c.height_in_blocks = jpg.MCU_rows * c.v_samp_factor
            if c.num_blocks > MAX_BLOCKS_PER_COMPONENT:
                raise _err(JpegError.IMAGE_TOO_LARGE, str(c.num_blocks))
            c.coeffs = np.zeros((c.num_blocks, 64), dtype=np.int16)
    if start + marker_len != pos:
        raise _err(JpegError.WRONG_MARKER_SIZE, f"{pos - start}")
    return pos


def _process_dht(data: bytes, pos: int, mode: ReadMode,
                 tables: _DecodeTables, jpg: JPEGData) -> int:
    start = pos
    marker_len = _read_u16(data, pos)
    pos += 2
    if marker_len == 2:
        raise _err(JpegError.EMPTY_DHT, "")
    while pos < start + marker_len:
        _verify_len(data, start, marker_len, pos, 17)
        slot_id = data[pos]
        pos += 1
        is_ac = (slot_id & 0x10) != 0
        idx = slot_id & 0x0F
        _verify_input(idx, 0, 3, JpegError.INVALID_HUFFMAN_INDEX)
        counts = np.zeros(17, dtype=np.int32)
        total = 0
        for i in range(1, 17):
            counts[i] = data[pos]
            total += data[pos]
            pos += 1
        limit = HUFFMAN_ALPHABET_SIZE if is_ac else DC_ALPHABET_SIZE
        _verify_input(total, 0, limit, JpegError.INVALID_HUFFMAN_CODE)
        _verify_len(data, start, marker_len, pos, total)
        values = np.zeros(HUFFMAN_ALPHABET_SIZE + 1, dtype=np.int32)
        seen = set()
        for i in range(total):
            v = data[pos]
            pos += 1
            if not is_ac:
                _verify_input(v, 0, DC_ALPHABET_SIZE - 1,
                              JpegError.INVALID_HUFFMAN_CODE)
            if v in seen:
                raise _err(JpegError.INVALID_HUFFMAN_CODE, f"dup value {v}")
            seen.add(v)
            values[i] = v
        huff = HuffmanCode(counts=counts.copy(), values=values.copy(),
                           slot_id=slot_id,
                           is_last=(pos == start + marker_len))
        # Feasibility + sentinel padding, then build the decode LUT.
        huffman.validate_counts(counts, is_ac)
        c2, v2 = huffman.counts_with_sentinel(counts, values, total)
        if mode == ReadMode.ALL:
            lut = huffman.build_decode_lut(c2, v2)
            if is_ac:
                tables.ac[idx] = lut
            else:
                tables.dc[idx] = lut
        jpg.huffman_code.append(huff)
    if start + marker_len != pos:
        raise _err(JpegError.WRONG_MARKER_SIZE, f"{pos - start}")
    return pos


def _process_dqt(data: bytes, pos: int, jpg: JPEGData) -> int:
    start = pos
    marker_len = _read_u16(data, pos)
    pos += 2
    if marker_len == 2:
        raise _err(JpegError.EMPTY_DQT, "")
    while pos < start + marker_len and len(jpg.quant) < MAX_QUANT_TABLES:
        b = data[pos]
        pos += 1
        precision, index = b >> 4, b & 0xF
        _verify_input(index, 0, 3, JpegError.INVALID_QUANT_TBL_INDEX)
        nbytes = (2 if precision else 1) * 64
        _verify_len(data, start, marker_len, pos, nbytes)
        values = np.zeros(64, dtype=np.int32)
        for i in range(64):
            if precision:
                q = _read_u16(data, pos)
                pos += 2
            else:
                q = data[pos]
                pos += 1
            _verify_input(q, 1, 65535, JpegError.INVALID_QUANT_VAL)
            values[NATURAL_ORDER[i]] = q
        jpg.quant.append(QuantTable(values=values, precision=precision,
                                    index=index,
                                    is_last=(pos == start + marker_len)))
    if start + marker_len != pos:
        raise _err(JpegError.WRONG_MARKER_SIZE, f"{pos - start}")
    return pos


def _process_dri(data: bytes, pos: int, jpg: JPEGData) -> int:
    if jpg.restart_interval > 0:
        raise _err(JpegError.DUPLICATE_DRI, "")
    marker_len = _read_u16(data, pos)
    jpg.restart_interval = _read_u16(data, pos + 2)
    if marker_len != 4:
        raise _err(JpegError.WRONG_MARKER_SIZE, str(marker_len))
    return pos + 4


def _process_app(data: bytes, pos: int, jpg: JPEGData) -> int:
    marker_len = _read_u16(data, pos)
    _verify_input(marker_len, 2, 65535, JpegError.INVALID_MARKER_LEN)
    _verify_len(data, pos, marker_len, pos + 2, marker_len - 2)
    # Keep the marker byte with the payload for byte-exact passthrough.
    jpg.app_data.append(data[pos - 1:pos + marker_len])
    return pos + marker_len


def _process_com(data: bytes, pos: int, jpg: JPEGData) -> int:
    marker_len = _read_u16(data, pos)
    _verify_input(marker_len, 2, 65535, JpegError.INVALID_MARKER_LEN)
    _verify_len(data, pos, marker_len, pos + 2, marker_len - 2)
    jpg.com_data.append(data[pos:pos + marker_len])
    return pos + marker_len


def _process_sos_header(data: bytes, pos: int, jpg: JPEGData) -> (int, ScanInfo):
    start = pos
    marker_len = _read_u16(data, pos)
    ncomp = data[pos + 2]
    pos += 3
    _verify_input(ncomp, 1, len(jpg.components),
                  JpegError.INVALID_COMPS_IN_SCAN)
    si = ScanInfo()
    ids_seen = set()
    for _ in range(ncomp):
        cid = data[pos]
        if cid in ids_seen:
            raise _err(JpegError.DUPLICATE_COMPONENT_ID, str(cid))
        ids_seen.add(cid)
        comp_idx = next((j for j, c in enumerate(jpg.components)
                         if c.id == cid), None)
        if comp_idx is None:
            raise _err(JpegError.COMPONENT_NOT_FOUND, str(cid))
        c = data[pos + 1]
        dc_idx, ac_idx = c >> 4, c & 0xF
        _verify_input(dc_idx, 0, 3, JpegError.INVALID_HUFFMAN_INDEX)
        _verify_input(ac_idx, 0, 3, JpegError.INVALID_HUFFMAN_INDEX)
        si.components.append(ComponentScanInfo(comp_idx, dc_idx, ac_idx))
        pos += 2
    si.Ss = data[pos]
    si.Se = data[pos + 1]
    _verify_input(si.Ss, 0, 63, JpegError.INVALID_START_OF_SCAN)
    _verify_input(si.Se, si.Ss, 63, JpegError.INVALID_END_OF_SCAN)
    c = data[pos + 2]
    si.Ah, si.Al = c >> 4, c & 0xF
    pos += 3
    # All referenced Huffman tables must already be defined.
    slots = {h.slot_id for h in jpg.huffman_code}
    for cs in si.components:
        if si.Ss == 0 and cs.dc_tbl_idx not in slots:
            raise _err(JpegError.HUFFMAN_TABLE_NOT_FOUND,
                       f"DC {cs.dc_tbl_idx}")
        if si.Se > 0 and (cs.ac_tbl_idx + 16) not in slots:
            raise _err(JpegError.HUFFMAN_TABLE_NOT_FOUND,
                       f"AC {cs.ac_tbl_idx}")
    jpg.scan_info.append(si)
    if start + marker_len != pos:
        raise _err(JpegError.WRONG_MARKER_SIZE, f"{pos - start}")
    return pos, si


def _process_scan(data: bytes, pos: int, tables: _DecodeTables,
                  scan_progression: np.ndarray, is_progressive: bool,
                  jpg: JPEGData) -> int:
    pos, si = _process_sos_header(data, pos, jpg)
    interleaved = len(si.components) > 1
    if interleaved:
        mcus_per_row, mcu_rows = jpg.MCU_cols, jpg.MCU_rows
    else:
        c = jpg.components[si.components[0].comp_idx]
        mcus_per_row = -(-(jpg.width * c.h_samp_factor)
                         // (8 * jpg.max_h_samp_factor))
        mcu_rows = -(-(jpg.height * c.v_samp_factor)
                     // (8 * jpg.max_v_samp_factor))

    Al = si.Al if is_progressive else 0
    Ah = si.Ah if is_progressive else 0
    Ss = si.Ss if is_progressive else 0
    Se = si.Se if is_progressive else 63

    scan_bitmask = np.uint16((0xFFFF << Al) & 0xFFFF) if Ah == 0 \
        else np.uint16(1 << Al)
    refinement_bitmask = np.uint16((1 << Al) - 1)
    for cs in si.components:
        prog = scan_progression[cs.comp_idx, Ss:Se + 1]
        if np.any(prog & scan_bitmask):
            raise _err(JpegError.OVERLAPPING_SCANS, "")
        if np.any(prog & refinement_bitmask):
            raise _err(JpegError.INVALID_SCAN_ORDER, "")
        scan_progression[cs.comp_idx, Ss:Se + 1] |= scan_bitmask
    if Al > 10:
        raise _err(JpegError.NON_REPRESENTABLE_AC_COEFF, f"Al={Al}")

    # Fast path: C scan decoder if the native extension is available.
    try:
        from guetzli_tpu.jpeg import _native  # noqa
        return _native.decode_scan(data, pos, jpg, si, tables,
                                   is_progressive)
    except ImportError:
        pass

    br = BitReader(data, pos)
    state = {'last_dc': [0] * MAX_COMPONENTS, 'eobrun': -1}
    restarts_to_go = jpg.restart_interval
    next_restart = 0
    for mcu_y in range(mcu_rows):
        for mcu_x in range(mcus_per_row):
            if jpg.restart_interval > 0:
                if restarts_to_go == 0:
                    rpos = br.finish()
                    _expect_marker(data, rpos)
                    if data[rpos + 1] != 0xD0 + next_restart:
                        raise _err(JpegError.INVALID_MARKER,
                                   f"wrong RST at {rpos}")
                    br.reset(rpos + 2)
                    next_restart = (next_restart + 1) & 7
                    state['last_dc'] = [0] * MAX_COMPONENTS
                    if state['eobrun'] > 0:
                        raise _err(JpegError.EOB_RUN_TOO_LONG, "")
                    state['eobrun'] = -1
                    restarts_to_go = jpg.restart_interval
                restarts_to_go -= 1
            for cs in si.components:
                c = jpg.components[cs.comp_idx]
                dc_lut = tables.dc[cs.dc_tbl_idx]
                ac_lut = tables.ac[cs.ac_tbl_idx]
                nby = c.v_samp_factor if interleaved else 1
                nbx = c.h_samp_factor if interleaved else 1
                for iy in range(nby):
                    for ix in range(nbx):
                        by = mcu_y * nby + iy
                        bx = mcu_x * nbx + ix
                        block = c.coeffs[by * c.width_in_blocks + bx]
                        if Ah == 0:
                            _decode_dct_block(dc_lut, ac_lut, Ss, Se, Al,
                                              state, br, block, cs.comp_idx)
                        else:
                            _refine_dct_block(ac_lut, Ss, Se, Al, state, br,
                                              block)
    if state['eobrun'] > 0:
        raise _err(JpegError.EOB_RUN_TOO_LONG, "")
    pos = br.finish()
    if pos > len(data):
        raise _err(JpegError.UNEXPECTED_EOF, f"pos={pos}")
    return pos


def _fixup_quant_indexes(jpg: JPEGData) -> None:
    for c in jpg.components:
        for j, q in enumerate(jpg.quant):
            if q.index == c.quant_idx:
                c.quant_idx = j
                break
        else:
            raise _err(JpegError.QUANT_TABLE_NOT_FOUND, str(c.quant_idx))
