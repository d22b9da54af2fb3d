"""ctypes bindings for the native host kernels (see bed_decode.cpp).

Gracefully degrades: ``available()`` returns False when the library cannot
be built (no compiler), and callers fall back to the NumPy paths.
"""
import ctypes
from typing import Optional

import numpy as np

_lib: Optional[ctypes.CDLL] = None
_tried = False

_u8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
_f8p = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
_i64 = ctypes.c_int64


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.na_decode_bed.argtypes = [_u8p, _i64, _i64, _i64, _u8p]
    lib.na_bed_to_packed.argtypes = [_u8p, _i64, _i64, _i64, _i64, _u8p]
    lib.na_pack_2bit.argtypes = [_u8p, _i64, _i64, _i64, _u8p]
    lib.na_loglikelihood.argtypes = [_u8p, _f8p, _f8p, _i64, _i64, _i64,
                                     ctypes.c_double]
    lib.na_loglikelihood.restype = ctypes.c_double
    try:
        # Optional: a stale shipped .so predating the (spec-conformant v2)
        # PGEN decoder must not disable the other kernels -- and must not
        # be used for PGEN decoding either, hence the versioned symbol.
        _i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
        lib.na_pgen_decode2.argtypes = [_u8p, _i64p, _u8p, _i64, _i64, _i64,
                                        _i64, _u8p, _i64p, _u8p]
        lib.na_pgen_decode2.restype = _i64
        lib._has_pgen = True
    except AttributeError:
        lib._has_pgen = False
    return lib


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        from .build import build
        try:
            _lib = _bind(ctypes.CDLL(str(build())))
        except (OSError, AttributeError):
            # A shipped/stale .so: either built for another platform
            # (OSError on load) or loadable but predating a REQUIRED
            # symbol (AttributeError in _bind). Rebuild for THIS host
            # with the local toolchain before giving up.
            _lib = _bind(ctypes.CDLL(str(build(force=True))))
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def decode_bed(B: np.ndarray, N: int) -> np.ndarray:
    """SNP-major BED bytes (M, ceil(N/4)) -> (N, M) uint8 dosages."""
    lib = _load()
    B = np.ascontiguousarray(B, dtype=np.uint8)
    M, nbytes = B.shape
    out = np.empty((N, M), dtype=np.uint8)
    lib.na_decode_bed(B, M, nbytes, N, out)
    return out


def bed_to_packed(B: np.ndarray, N: int, m_pad: int) -> np.ndarray:
    """SNP-major BED bytes -> sample-major 2-bit packed (N, m_pad//4),
    without materializing the (N, M) uint8 matrix."""
    lib = _load()
    B = np.ascontiguousarray(B, dtype=np.uint8)
    M, nbytes = B.shape
    assert m_pad % 4 == 0 and m_pad >= M
    W = m_pad // 4
    out = np.zeros((N, W), dtype=np.uint8)
    lib.na_bed_to_packed(B, M, nbytes, N, W, out)
    return out


def pack_2bit(G: np.ndarray, m_pad: int) -> np.ndarray:
    lib = _load()
    G = np.ascontiguousarray(G, dtype=np.uint8)
    N, M = G.shape
    assert m_pad % 4 == 0 and m_pad >= M
    W = m_pad // 4
    out = np.zeros((N, W), dtype=np.uint8)
    lib.na_pack_2bit(G, N, M, W, out)
    return out


def loglikelihood(G: np.ndarray, P: np.ndarray, Q: np.ndarray,
                  eps: float = 1e-6) -> float:
    lib = _load()
    G = np.ascontiguousarray(G, dtype=np.uint8)
    P = np.ascontiguousarray(P, dtype=np.float64)
    Q = np.ascontiguousarray(Q, dtype=np.float64)
    N, M = G.shape
    K = P.shape[1]
    assert Q.shape == (N, K) and P.shape == (M, K)
    return float(lib.na_loglikelihood(G, P, Q, N, M, K, eps))


def pgen_available() -> bool:
    lib = _load()
    return lib is not None and getattr(lib, "_has_pgen", False)


def pgen_decode(recs: np.ndarray, rec_off: np.ndarray, vrtypes: np.ndarray,
                skip: int, N: int, sid_bytes: int, base: np.ndarray,
                base_valid: np.ndarray) -> np.ndarray:
    """Decode mode-0x10/0x11 variant records (io.pgen_standard's hot loop).

    ``recs``: contiguous record bytes for len(vrtypes) variants, delimited
    by ``rec_off`` (len + 1 int64). The first ``skip`` variants only
    rebuild the LD-base state; the rest land in the returned
    (len - skip, N) uint8 array. ``base`` (N,) uint8 and ``base_valid``
    (1,) int64 persist the LD state across calls (caller-owned).
    Raises ValueError on malformed/unsupported records (callers fall back
    to the pure-Python decoder).
    """
    lib = _load()
    n_var = vrtypes.shape[0]
    out = np.empty((n_var - skip, N), dtype=np.uint8)
    rc = lib.na_pgen_decode2(
        np.ascontiguousarray(recs, np.uint8),
        np.ascontiguousarray(rec_off, np.int64),
        np.ascontiguousarray(vrtypes, np.uint8),
        n_var, skip, N, sid_bytes, base, base_valid, out)
    if rc != 0:
        raise ValueError(f"na_pgen_decode2 failed with code {rc}")
    return out
