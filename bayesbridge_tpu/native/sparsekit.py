"""ctypes binding for the native sparsekit data loader.

Loads (and if needed builds) libsparsekit.so. Every entry point degrades
gracefully to a NumPy fallback (see design/ell.py), so the library works
without a compiler; the native path just makes one-time preparation of
very large designs (n ~ 1e5+, nnz ~ 1e8+) fast.
"""

import ctypes
import os
import subprocess
import warnings

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libsparsekit.so")
_lib = None
_load_attempted = False


def _build():
    try:
        subprocess.run(
            ["make", "-s", "-C", _HERE], check=True,
            capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # compiler missing, etc.
        warnings.warn(f"sparsekit native build failed ({e}); "
                      "using NumPy fallbacks.")
        return False


def get_lib():
    """Load the shared library, building it on first use if possible."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        warnings.warn(f"sparsekit load failed ({e}); using NumPy fallbacks.")
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.csr_to_ell_f64.argtypes = [
        i64p, i32p, f64p, ctypes.c_int64, ctypes.c_int64, i32p, f64p]
    lib.csr_to_ell_f32.argtypes = [
        i64p, i32p, f32p, ctypes.c_int64, ctypes.c_int64, i32p, f32p]
    lib.csr_col_sums_f64.argtypes = [
        i64p, i32p, f64p, ctypes.c_int64, ctypes.c_int64, f64p]
    lib.csr_max_row_len.argtypes = [i64p, ctypes.c_int64]
    lib.csr_max_row_len.restype = ctypes.c_int64
    _lib = lib
    return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def try_csr_to_ell(indptr, indices, data, n_rows, k_max):
    """Native ELL padding; returns None if the native library is absent
    or the dtype is unsupported."""
    lib = get_lib()
    if lib is None:
        return None
    if data.dtype == np.float64:
        fn, ct = lib.csr_to_ell_f64, ctypes.c_double
    elif data.dtype == np.float32:
        fn, ct = lib.csr_to_ell_f32, ctypes.c_float
    else:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    data = np.ascontiguousarray(data)
    ell_idx = np.zeros((n_rows, k_max), dtype=np.int32)
    ell_val = np.zeros((n_rows, k_max), dtype=data.dtype)
    fn(_ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int32),
       _ptr(data, ct), n_rows, k_max,
       _ptr(ell_idx, ctypes.c_int32), _ptr(ell_val, ct))
    return ell_idx, ell_val


def try_col_means(indptr, indices, data, n_rows, n_cols):
    lib = get_lib()
    if lib is None or data.dtype != np.float64:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    data = np.ascontiguousarray(data)
    out = np.zeros(n_cols, dtype=np.float64)
    lib.csr_col_sums_f64(
        _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int32),
        _ptr(data, ctypes.c_double), n_rows, n_cols,
        _ptr(out, ctypes.c_double))
    return out / n_rows
