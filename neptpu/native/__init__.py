"""ctypes loader for the native runtime library (see neptpu_native.cpp).

``lib()`` returns the loaded library or None; callers keep pure-Python
fallbacks so an unbuilt checkout still works.  ``build()`` compiles it with
the in-tree Makefile (g++).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libneptpu_native.so")
_lib = None
_tried = False


def build(quiet=True):
    """Compile the native library in-tree."""
    r = subprocess.run(["make", "-C", _HERE], capture_output=quiet)
    return r.returncode == 0


def lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            if not build():
                return None
        except Exception:
            return None
    try:
        L = ctypes.CDLL(_SO)
        L.msws_gen_mat.argtypes = [ctypes.c_uint64, ctypes.c_int64, ctypes.c_int64,
                                   ctypes.POINTER(ctypes.c_double)]
        L.msws_gen_ints.argtypes = [ctypes.c_uint64, ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_uint64)]
        L.read_sparse_matrix_text.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double)]
        L.read_sparse_matrix_text.restype = ctypes.c_int64
        L.searchsorted_i64.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        _lib = L
    except OSError:
        _lib = None
    return _lib


def msws_gen_mat(n, m, seed=0):
    """Native MSWS matrix generation (bit-exact with the Python MSWS_RNG);
    returns None if the library is unavailable."""
    import numpy as np

    L = lib()
    if L is None:
        return None
    out = np.empty((n, m), dtype=np.float64)
    L.msws_gen_mat(seed, n, m, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def read_sparse_matrix_text(path):
    """Native gallery text-format reader; returns scipy CSR or None."""
    import numpy as np

    L = lib()
    if L is None:
        return None
    dims = np.zeros(3, dtype=np.int64)
    dp = dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    nnz = L.read_sparse_matrix_text(path.encode(), dp, 0, None, None, None)
    if nnz < 0:
        return None
    rows = np.empty(nnz, dtype=np.int64)
    cols = np.empty(nnz, dtype=np.int64)
    vals = np.empty(nnz, dtype=np.float64)
    r = L.read_sparse_matrix_text(
        path.encode(), dp, nnz,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if r < 0:
        return None
    import scipy.sparse as sp

    return sp.csr_matrix(sp.coo_matrix((vals, (rows, cols)), shape=(dims[0], dims[1])))
