"""ctypes bindings for the native host runtime (libgtpu_host.so).

The shared library implements the optimizer's host-side hot paths —
Huffman construction, histogram clustering, the in-loop entropy-size
estimate, per-block symbol histograms and entropy-coded scan packing —
with semantics identical to the pure-Python twins (which remain the
fallback when the library isn't built). `available()` gates every use;
`GUETZLI_TPU_NO_NATIVE=1` forces the Python paths.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libgtpu_host.so"
_lib = None

HIST_SIZE = 257


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("GUETZLI_TPU_NO_NATIVE"):
        return None
    if not _LIB_PATH.exists():
        src = _DIR / "host_runtime.cc"
        if not src.exists():
            return None
        try:
            subprocess.run(["bash", str(_DIR / "build.sh")], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    lib.gtpu_huffman_depths.argtypes = [i64p, ctypes.c_int32,
                                        ctypes.c_int32, i32p]
    lib.gtpu_huffman_depths.restype = None
    lib.gtpu_cluster_cost.argtypes = [i64p, ctypes.c_int32]
    lib.gtpu_cluster_cost.restype = ctypes.c_int64
    lib.gtpu_cluster_full.argtypes = [i64p, ctypes.c_int32, i64p, i32p,
                                      i32p]
    lib.gtpu_cluster_full.restype = ctypes.c_int32
    lib.gtpu_entropy_size.argtypes = [i64p, ctypes.c_int32]
    lib.gtpu_entropy_size.restype = ctypes.c_int64
    lib.gtpu_block_ac_histograms.argtypes = [i32p, ctypes.c_int64, i64p]
    lib.gtpu_block_ac_histograms.restype = None
    lib.gtpu_total_ac_hist_nat.argtypes = [i32p, ctypes.c_int64, i32p,
                                           i32p, ctypes.c_int64, i64p]
    lib.gtpu_total_ac_hist_nat.restype = None
    lib.gtpu_component_histograms.argtypes = [i32p, ctypes.c_int64, i64p,
                                              i64p]
    lib.gtpu_component_histograms.restype = None
    lib.gtpu_encode_scan.argtypes = [i32p, i64p, i32p, ctypes.c_int32,
                                     i32p, i32p, i32p, i32p, u8p,
                                     ctypes.c_int64]
    lib.gtpu_encode_scan.restype = ctypes.c_int64
    lib.gtpu_pack_bits.argtypes = [i64p, i32p, ctypes.c_int64, u8p,
                                   ctypes.c_int64]
    lib.gtpu_pack_bits.restype = ctypes.c_int64
    lib.gtpu_delta_hist.argtypes = [i64p, i64p, ctypes.c_int64, i32p,
                                    i32p, i64p]
    lib.gtpu_delta_hist.restype = None
    lib.gtpu_commit_hist.argtypes = [i64p, i64p, ctypes.c_int64, i32p,
                                     i32p, i64p]
    lib.gtpu_commit_hist.restype = None
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.gtpu_global_order.argtypes = [f32p, i64p, i64p, f32p, f64p,
                                      ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_int32, i32p, f64p,
                                      ctypes.c_int64, i64p]
    lib.gtpu_global_order.restype = ctypes.c_int64
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def huffman_depths(hist: np.ndarray, limit: int = 16) -> np.ndarray:
    lib = _load()
    h = np.ascontiguousarray(hist, dtype=np.int64)
    out = np.zeros(len(h), dtype=np.int32)
    lib.gtpu_huffman_depths(_i64p(h), len(h), limit, _i32p(out))
    return out


def cluster_cost(histos) -> int:
    lib = _load()
    stacked = np.ascontiguousarray(np.stack(histos), dtype=np.int64)
    return int(lib.gtpu_cluster_cost(_i64p(stacked), len(histos)))


def cluster_full(histos):
    """Returns (clustered list, indexes list, depths list) matching
    writer._cluster_histograms (minus the cost)."""
    lib = _load()
    k = len(histos)
    stacked = np.ascontiguousarray(np.stack(histos), dtype=np.int64)
    clustered = np.zeros((k, HIST_SIZE), dtype=np.int64)
    indexes = np.zeros(k, dtype=np.int32)
    depths = np.zeros((k, HIST_SIZE), dtype=np.int32)
    num = lib.gtpu_cluster_full(_i64p(stacked), k, _i64p(clustered),
                                _i32p(indexes), _i32p(depths))
    return ([clustered[i] for i in range(num)], [int(i) for i in indexes],
            [depths[i] for i in range(num)])


def entropy_size(histos) -> int:
    lib = _load()
    stacked = np.ascontiguousarray(np.stack(histos), dtype=np.int64)
    return int(lib.gtpu_entropy_size(_i64p(stacked), len(histos)))


def block_ac_histograms(zz: np.ndarray) -> np.ndarray:
    """(N, 64) zigzag int coefficients -> (N, 256) int64 AC histograms."""
    lib = _load()
    z = np.ascontiguousarray(zz, dtype=np.int32)
    out = np.zeros((z.shape[0], 256), dtype=np.int64)
    lib.gtpu_block_ac_histograms(_i32p(z), z.shape[0], _i64p(out))
    return out


def total_ac_hist_nat(state3: np.ndarray, ci: int,
                      quant_nat: np.ndarray) -> np.ndarray:
    """(N, C, 64) natural-order int32 state (multiples of quant) ->
    (256,) int64 total AC histogram of component ci (x2 counting,
    ZRL/EOB included), one C pass with the division and zigzag reorder
    folded in — no per-block histogram materialization."""
    lib = _load()
    st = np.ascontiguousarray(state3, dtype=np.int32)
    n, ncomp, _ = st.shape
    q = np.ascontiguousarray(quant_nat, dtype=np.int32)
    out = np.zeros(256, dtype=np.int64)
    ptr = ctypes.cast(st.ctypes.data + ci * 64 * 4,
                      ctypes.POINTER(ctypes.c_int32))
    lib.gtpu_total_ac_hist_nat(ptr, ncomp * 64, _i32p(q),
                               _i32p(_zigzag_table()), n, _i64p(out))
    return out


def component_histograms(zz: np.ndarray):
    """(N, 64) zigzag coefficients -> (dc_hist, ac_hist), x2 counting with
    sentinel bins set to 1."""
    lib = _load()
    z = np.ascontiguousarray(zz, dtype=np.int32)
    dc = np.zeros(HIST_SIZE, dtype=np.int64)
    ac = np.zeros(HIST_SIZE, dtype=np.int64)
    dc[-1] = ac[-1] = 1
    lib.gtpu_component_histograms(_i32p(z), z.shape[0], _i64p(dc), _i64p(ac))
    return dc, ac


_ZIGZAG = None


def _zigzag_table():
    global _ZIGZAG
    if _ZIGZAG is None:
        from guetzli_tpu.jpeg.data import NATURAL_ORDER
        _ZIGZAG = np.ascontiguousarray(NATURAL_ORDER, dtype=np.int32)
    return _ZIGZAG


def delta_hist(perblock: np.ndarray, touched: np.ndarray,
               rows_div: np.ndarray) -> np.ndarray:
    """(256,) histogram delta: new-row AC counts minus perblock[touched]."""
    lib = _load()
    out = np.zeros(256, dtype=np.int64)
    t = np.ascontiguousarray(touched, dtype=np.int64)
    r = np.ascontiguousarray(rows_div, dtype=np.int32)
    lib.gtpu_delta_hist(_i64p(perblock), _i64p(t), len(t), _i32p(r),
                        _i32p(_zigzag_table()), _i64p(out))
    return out


def commit_hist(perblock: np.ndarray, touched: np.ndarray,
                rows_div: np.ndarray, base_hist: np.ndarray) -> None:
    """In-place: perblock[touched] <- new rows' histograms; base_hist
    adjusted by the net delta."""
    lib = _load()
    t = np.ascontiguousarray(touched, dtype=np.int64)
    r = np.ascontiguousarray(rows_div, dtype=np.int32)
    lib.gtpu_commit_hist(_i64p(perblock), _i64p(t), len(t), _i32p(r),
                         _i32p(_zigzag_table()), _i64p(base_hist))


def global_order(cand_err, cand_count, last_indexes, block_weight,
                 max_block_error, direction):
    """Sorted global candidate order (see processor._build_global_order).
    Returns (blocks int32 (M,), vals float64 (M,), blocks_to_change)."""
    import ctypes as ct
    lib = _load()
    ce = cand_err if (isinstance(cand_err, np.ndarray)
                      and cand_err.dtype == np.float32
                      and cand_err.flags.c_contiguous) \
        else np.ascontiguousarray(cand_err, dtype=np.float32)
    n, steps = ce.shape
    cc = np.ascontiguousarray(cand_count, dtype=np.int64)
    li = np.ascontiguousarray(last_indexes, dtype=np.int64)
    bw = np.ascontiguousarray(block_weight, dtype=np.float32)
    mbe = np.ascontiguousarray(max_block_error, dtype=np.float64)
    cap = int(cc.sum() + li.sum() + 16)
    out_b = np.zeros(cap, dtype=np.int32)
    out_v = np.zeros(cap, dtype=np.float64)
    btc = ct.c_int64(0)
    total = lib.gtpu_global_order(
        ce.ctypes.data_as(ct.POINTER(ct.c_float)), _i64p(cc), _i64p(li),
        bw.ctypes.data_as(ct.POINTER(ct.c_float)),
        mbe.ctypes.data_as(ct.POINTER(ct.c_double)), n, steps,
        int(direction), _i32p(out_b),
        out_v.ctypes.data_as(ct.POINTER(ct.c_double)), cap,
        ct.byref(btc))
    if total < 0:
        raise RuntimeError("global_order capacity exceeded")
    return out_b[:total], out_v[:total], int(btc.value)


def encode_scan(zz_list, hv_list, dc_codes, dc_depths, ac_codes,
                ac_depths) -> bytes:
    """Packs the whole interleaved entropy-coded scan.

    zz_list: per-component (N_c, 64) zigzag coeffs in traversal order;
    hv_list: per-component blocks-per-MCU; code/depth tables: per-component
    (256,) int arrays."""
    lib = _load()
    ncomp = len(zz_list)
    zz = np.ascontiguousarray(np.concatenate(
        [np.asarray(z, dtype=np.int32).reshape(-1, 64) for z in zz_list]))
    n_blocks = np.asarray([z.shape[0] if z.ndim == 2 else len(z) // 64
                           for z in zz_list], dtype=np.int64)
    hv = np.asarray(hv_list, dtype=np.int32)

    def table(arrs):
        t = np.zeros((ncomp, 256), dtype=np.int32)
        for i, a in enumerate(arrs):
            t[i, :min(256, len(a))] = np.asarray(a[:256], dtype=np.int32)
        return np.ascontiguousarray(t)

    dcc, dcd = table(dc_codes), table(dc_depths)
    acc, acd = table(ac_codes), table(ac_depths)
    total_blocks = int(n_blocks.sum())
    cap = total_blocks * 128 + 1024  # worst case << 2 bytes/coeff
    out = np.zeros(cap, dtype=np.uint8)
    n = lib.gtpu_encode_scan(
        _i32p(zz), _i64p(n_blocks), _i32p(hv), ncomp,
        _i32p(dcc), _i32p(dcd), _i32p(acc), _i32p(acd),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        raise RuntimeError("scan buffer overflow")
    return out[:n].tobytes()
