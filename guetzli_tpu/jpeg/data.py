"""In-memory JPEG model.

numpy-backed equivalent of the reference data model
(guetzli/jpeg_data.h:85-204): quantization tables, Huffman codes, scan layout,
per-component DCT coefficients, and pass-through metadata. Coefficients are
held as one `(num_blocks, 64)` int16 array per component, natural (row-major)
order within each block — the layout the device pipeline consumes directly.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

DCT_BLOCK_SIZE = 64
MAX_COMPONENTS = 4
MAX_QUANT_TABLES = 4
MAX_HUFFMAN_TABLES = 4
HUFFMAN_MAX_BIT_LENGTH = 16
HUFFMAN_ALPHABET_SIZE = 256
DC_ALPHABET_SIZE = 12
MAX_DHT_MARKERS = 512

# Standard JPEG zig-zag: ZIGZAG_ORDER[natural_idx] = zigzag position,
# NATURAL_ORDER[zigzag_idx] = natural position (ITU T.81 Figure A.6; same
# tables as reference guetzli/jpeg_data.h:59-82).
NATURAL_ORDER = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

ZIGZAG_ORDER = np.empty(64, dtype=np.int32)
ZIGZAG_ORDER[NATURAL_ORDER] = np.arange(64, dtype=np.int32)

# Annex K.1 example luminance/chrominance tables (also used as the
# reference's defaults, guetzli/jpeg_data.h:40-57). Natural order.
DEFAULT_QUANT_MATRIX = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99],
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)


@dataclasses.dataclass
class QuantTable:
    values: np.ndarray = dataclasses.field(
        default_factory=lambda: np.ones(64, dtype=np.int32))
    precision: int = 0
    index: int = 0
    is_last: bool = True


@dataclasses.dataclass
class HuffmanCode:
    """One DHT table: bit-length histogram + symbol values.

    counts[1..16] = number of codes of each length; values = symbols sorted
    by increasing code length (reference guetzli/jpeg_data.h:100-115).
    """

    counts: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(HUFFMAN_MAX_BIT_LENGTH + 1,
                                         dtype=np.int32))
    values: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(HUFFMAN_ALPHABET_SIZE + 1,
                                         dtype=np.int32))
    slot_id: int = 0
    is_last: bool = True


@dataclasses.dataclass
class ComponentScanInfo:
    comp_idx: int
    dc_tbl_idx: int
    ac_tbl_idx: int


@dataclasses.dataclass
class ScanInfo:
    Ss: int = 0
    Se: int = 63
    Ah: int = 0
    Al: int = 0
    components: List[ComponentScanInfo] = dataclasses.field(
        default_factory=list)


@dataclasses.dataclass
class Component:
    id: int = 0
    h_samp_factor: int = 1
    v_samp_factor: int = 1
    quant_idx: int = 0
    width_in_blocks: int = 0
    height_in_blocks: int = 0
    # (num_blocks, 64) int16, natural order within block, blocks in raster
    # order over the component's block grid.
    coeffs: Optional[np.ndarray] = None

    @property
    def num_blocks(self) -> int:
        return self.width_in_blocks * self.height_in_blocks


@dataclasses.dataclass
class JPEGData:
    width: int = 0
    height: int = 0
    version: int = 0
    max_h_samp_factor: int = 1
    max_v_samp_factor: int = 1
    MCU_rows: int = 0
    MCU_cols: int = 0
    restart_interval: int = 0
    app_data: List[bytes] = dataclasses.field(default_factory=list)
    com_data: List[bytes] = dataclasses.field(default_factory=list)
    quant: List[QuantTable] = dataclasses.field(default_factory=list)
    huffman_code: List[HuffmanCode] = dataclasses.field(default_factory=list)
    components: List[Component] = dataclasses.field(default_factory=list)
    scan_info: List[ScanInfo] = dataclasses.field(default_factory=list)
    marker_order: List[int] = dataclasses.field(default_factory=list)
    inter_marker_data: List[bytes] = dataclasses.field(default_factory=list)
    tail_data: bytes = b""
    error: str = "OK"

    def is_420(self) -> bool:
        # Reference semantics: guetzli/jpeg_data.cc:24-37.
        if len(self.components) != 3:
            return False
        c0, c1, c2 = self.components
        return (c0.h_samp_factor == 2 and c0.v_samp_factor == 2
                and c1.h_samp_factor == 1 and c1.v_samp_factor == 1
                and c2.h_samp_factor == 1 and c2.v_samp_factor == 1)

    def is_444(self) -> bool:
        # Reference semantics: guetzli/jpeg_data.cc:39-46.
        if len(self.components) != 3:
            return False
        return all(c.h_samp_factor == 1 and c.v_samp_factor == 1
                   for c in self.components)


def init_yuv444(width: int, height: int) -> JPEGData:
    """Blank YUV444 JPEGData with all-ones quant, per reference
    guetzli/jpeg_data.cc:48-68 (used by the RGB bootstrap path)."""
    jpg = JPEGData(width=width, height=height)
    nbx = (width + 7) // 8
    nby = (height + 7) // 8
    jpg.max_h_samp_factor = 1
    jpg.max_v_samp_factor = 1
    jpg.MCU_rows = nby
    jpg.MCU_cols = nbx
    for i in range(3):
        jpg.quant.append(QuantTable(values=np.ones(64, dtype=np.int32),
                                    index=i))
        jpg.components.append(Component(
            id=i, h_samp_factor=1, v_samp_factor=1, quant_idx=i,
            width_in_blocks=nbx, height_in_blocks=nby,
            coeffs=np.zeros((nbx * nby, 64), dtype=np.int16)))
    return jpg


def save_quant_tables(q: np.ndarray, jpg: JPEGData) -> None:
    """Install per-component quant matrices, deduplicating identical tables
    and picking 8/16-bit precision (reference guetzli/jpeg_data.cc:70-102).

    q: (3, 64) int array, natural order.
    """
    jpg.quant = []
    for c, comp in enumerate(jpg.components):
        found = None
        for idx, t in enumerate(jpg.quant):
            if np.array_equal(t.values, q[c]):
                found = idx
                break
        if found is None:
            table = QuantTable(values=np.asarray(q[c], dtype=np.int32).copy(),
                               precision=1 if int(np.max(q[c])) > 255 else 0,
                               index=len(jpg.quant))
            jpg.quant.append(table)
            found = table.index
        comp.quant_idx = found
