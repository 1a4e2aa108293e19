"""ctypes bindings for the native data plane (``native/fastload.cpp``).

Loads ``libfastload.so`` if present (``make -C native``), otherwise every
entry point reports unavailable and the pure-numpy loaders are used. The
Python↔C++ boundary is plain C ABI + preallocated numpy buffers — no
pybind11 (not in the image), no copies beyond the parse itself.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libfastload.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.fl_count_rows.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
    lib.fl_count_rows.restype = ctypes.c_int
    lib.fl_load_ratings.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
    ]
    lib.fl_load_ratings.restype = ctypes.c_int64
    lib.fl_load_matrix.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_char,
        ctypes.c_int64,
    ]
    lib.fl_load_matrix.restype = ctypes.c_int64
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def count_rows(path: str) -> int:
    lib = _load()
    if lib is None:
        raise RuntimeError("libfastload.so not built (make -C native)")
    n = ctypes.c_int64(0)
    if lib.fl_count_rows(path.encode(), ctypes.byref(n)) != 0:
        raise OSError(f"fastload: cannot open {path}")
    return n.value


def load_ratings(path: str) -> np.ndarray:
    """(N, 3) float64 [user, item, rating] from a MovieLens-format file."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libfastload.so not built (make -C native)")
    n = count_rows(path)
    out = np.empty((n, 3), np.float64)
    got = lib.fl_load_ratings(path.encode(), out, n)
    if got < 0:
        raise OSError(f"fastload: cannot open {path}")
    return out[:got]


def load_matrix(path: str, cols: int, *, sep: str = " ", skip_header: int = 0) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("libfastload.so not built (make -C native)")
    n = count_rows(path) - skip_header
    out = np.empty((n, cols), np.float64)
    got = lib.fl_load_matrix(path.encode(), out, n, cols, sep.encode()[0], skip_header)
    if got < 0:
        raise OSError(f"fastload: cannot open {path}")
    return out[:got]
