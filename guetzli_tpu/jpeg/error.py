"""JPEG read/validation error codes.

Same validation surface as the reference (guetzli/jpeg_error.h:24-67), as a
Python enum; the parser records the code on the JPEGData and raises/returns.
"""

from __future__ import annotations

import enum


class JpegError(enum.Enum):
    OK = 0
    SOI_NOT_FOUND = 1
    SOF_NOT_FOUND = 2
    UNEXPECTED_EOF = 3
    MARKER_BYTE_NOT_FOUND = 4
    UNSUPPORTED_MARKER = 5
    WRONG_MARKER_SIZE = 6
    INVALID_MARKER_LEN = 7
    INVALID_SAMPLING_FACTORS = 8
    INVALID_PRECISION = 9
    INVALID_WIDTH = 10
    INVALID_HEIGHT = 11
    INVALID_NUMCOMP = 12
    INVALID_SAMP_FACTOR = 13
    INVALID_START_OF_SCAN = 14
    INVALID_END_OF_SCAN = 15
    INVALID_SCAN_BIT_POSITION = 16
    INVALID_COMPS_IN_SCAN = 17
    INVALID_HUFFMAN_INDEX = 18
    INVALID_QUANT_TBL_INDEX = 19
    INVALID_QUANT_VAL = 20
    INVALID_MARKER = 21
    INVALID_SYMBOL = 22
    NON_REPRESENTABLE_DC_COEFF = 23
    NON_REPRESENTABLE_AC_COEFF = 24
    INVALID_SCAN = 25
    OVERLAPPING_SCANS = 26
    INVALID_SCAN_ORDER = 27
    EXTRA_ZERO_RUN = 28
    DUPLICATE_COMPONENT_ID = 29
    COMPONENT_NOT_FOUND = 30
    HUFFMAN_TABLE_NOT_FOUND = 31
    HUFFMAN_TABLE_ERROR = 32
    OUT_OF_BAND_COEFF = 33
    EOB_RUN_TOO_LONG = 34
    IMAGE_TOO_LARGE = 35
    INVALID_QUANT_MATRIX_SIZE = 36
    INVALID_COMPONENT_ID = 37
    DUPLICATE_SOF = 38
    DUPLICATE_SOS = 39
    DUPLICATE_DRI = 40
    EMPTY_DHT = 41
    EMPTY_DQT = 42
    DUPLICATE_HUFFMAN_CODE = 43
    INVALID_HUFFMAN_CODE = 44
    QUANT_TABLE_NOT_FOUND = 45
    EOB_RUN_CROSSING_DC = 46


class JpegDecodeError(Exception):
    """Raised by the parser on malformed input; carries the JpegError code."""

    def __init__(self, code: JpegError, message: str = ""):
        self.code = code
        super().__init__(f"{code.name}: {message}" if message else code.name)
