"""ctypes bindings to the native runtime library (src/native.cpp).

Compiles lazily with g++ on first use (cached as ``_native.so`` next to
the source); every entry point has a numpy fallback so the package works
without a toolchain.  See native.cpp header for what lives here and why.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "native.cpp")
_SO = os.path.join(_HERE, "_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-fopenmp", "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        try:  # retry without OpenMP
            subprocess.run(["g++", "-O3", "-fPIC", "-shared", "-o", _SO,
                            _SRC], check=True, capture_output=True,
                           timeout=120)
            return True
        except Exception:
            return False


def get_lib():
    """The loaded ctypes library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64 = ctypes.c_int64
        u64 = ctypes.c_uint64
        p = ctypes.POINTER
        lib.csr_row_normalize.argtypes = [p(ctypes.c_int64),
                                          p(ctypes.c_float), i64]
        lib.csr_spmm.argtypes = [p(ctypes.c_int64), p(ctypes.c_int32),
                                 p(ctypes.c_float), p(ctypes.c_float),
                                 p(ctypes.c_float), i64, i64]
        lib.bin_counts.argtypes = [p(ctypes.c_int64), p(ctypes.c_int32),
                                   p(ctypes.c_double), i64, i64, i64]
        lib.gram_accumulate.argtypes = [p(ctypes.c_double),
                                        p(ctypes.c_double), i64, i64]
        lib.load_f32.argtypes = [ctypes.c_char_p, p(ctypes.c_float), i64,
                                 i64]
        lib.load_f32.restype = ctypes.c_int
        lib.load_f64_as_f32.argtypes = [ctypes.c_char_p, p(ctypes.c_float),
                                        i64, i64]
        lib.load_f64_as_f32.restype = ctypes.c_int
        lib.shuffled_indices.argtypes = [p(ctypes.c_int64), i64, u64]
        _lib = lib
        return _lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# High-level wrappers (native with numpy fallback)
# ---------------------------------------------------------------------------


def csr_row_normalize(indptr, data):
    """Normalize CSR rows in place; returns data."""
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    data = np.ascontiguousarray(data, dtype=np.float32)
    lib = get_lib()
    n = len(indptr) - 1
    if lib is not None:
        lib.csr_row_normalize(_ptr(indptr, ctypes.c_int64),
                              _ptr(data, ctypes.c_float), n)
        return data
    for i in range(n):
        s = data[indptr[i]:indptr[i + 1]].sum()
        if s > 1e-12:
            data[indptr[i]:indptr[i + 1]] /= s
    return data


def csr_spmm(indptr, indices, data, P):
    """T @ P for CSR T and dense P (n, C), float32."""
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    data = np.ascontiguousarray(data, dtype=np.float32)
    P = np.ascontiguousarray(P, dtype=np.float32)
    n, C = P.shape
    lib = get_lib()
    if lib is not None:
        out = np.empty_like(P)
        lib.csr_spmm(_ptr(indptr, ctypes.c_int64),
                     _ptr(indices, ctypes.c_int32),
                     _ptr(data, ctypes.c_float), _ptr(P, ctypes.c_float),
                     _ptr(out, ctypes.c_float), n, C)
        return out
    out = np.zeros_like(P)
    for i in range(n):
        k0, k1 = indptr[i], indptr[i + 1]
        if k1 > k0:
            out[i] = data[k0:k1] @ P[indices[k0:k1]]
    return out


def bin_counts(bins, gr_id, G, nbins):
    """(G, nbins) float64 count matrix from node bins + graph membership."""
    bins = np.ascontiguousarray(bins, dtype=np.int64)
    gr_id = np.ascontiguousarray(gr_id, dtype=np.int32)
    lib = get_lib()
    out = np.zeros((G, nbins), dtype=np.float64)
    if lib is not None:
        lib.bin_counts(_ptr(bins, ctypes.c_int64),
                       _ptr(gr_id, ctypes.c_int32),
                       _ptr(out, ctypes.c_double), len(bins), G, nbins)
        return out
    np.add.at(out, (gr_id, np.clip(bins, 0, nbins - 1)), 1.0)
    return out


def gram_accumulate(M, K):
    """K += M Mᵀ (float64, in place); returns K."""
    M = np.ascontiguousarray(M, dtype=np.float64)
    K = np.ascontiguousarray(K, dtype=np.float64)
    lib = get_lib()
    if lib is not None:
        G, nbins = M.shape
        lib.gram_accumulate(_ptr(M, ctypes.c_double),
                            _ptr(K, ctypes.c_double), G, nbins)
        return K
    K += M @ M.T
    return K


def load_matrix_f32(path, shape, offset_bytes=0, src_dtype="f4"):
    """mmap'ed raw binary → float32 array (native fast path)."""
    out = np.empty(int(np.prod(shape)), dtype=np.float32)
    lib = get_lib()
    if lib is not None:
        fn = lib.load_f32 if src_dtype == "f4" else lib.load_f64_as_f32
        rc = fn(path.encode(), _ptr(out, ctypes.c_float), out.size,
                offset_bytes)
        if rc == 0:
            return out.reshape(shape)
    dt = np.float32 if src_dtype == "f4" else np.float64
    raw = np.fromfile(path, dtype=dt, count=int(np.prod(shape)),
                      offset=offset_bytes)
    return raw.astype(np.float32).reshape(shape)


def shuffled_indices(n, seed=0):
    lib = get_lib()
    if lib is not None:
        out = np.empty(n, dtype=np.int64)
        lib.shuffled_indices(_ptr(out, ctypes.c_int64), n, seed)
        return out
    return np.random.default_rng(seed).permutation(n).astype(np.int64)
