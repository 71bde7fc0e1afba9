"""ctypes loader for the native ktable accelerators.

Compiles kdistr.cpp once (g++ -O3) into a cached shared library next to the
source; falls back by raising so callers can use the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "kdistr.cpp")
_LIB = os.path.join(_DIR, "_kdistr.so")
_lock = threading.Lock()
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", _SRC, "-o", _LIB],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        d = ctypes.POINTER(ctypes.c_double)
        i64 = ctypes.c_int64
        lib.kdistr_tp.argtypes = [d, d, i64, d, i64, d, d, i64, d]
        lib.kdistr_tp.restype = None
        lib.bilinear_tp.argtypes = [d, i64, i64, i64, d, d, d, i64, d,
                                    i64, d]
        lib.bilinear_tp.restype = None
        _lib = lib
        return lib


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def kdistr_native(lamda_hk, opac_hk, lamda_int, delta_lamda, y_gauss):
    """Per-(T,P) k-distribution over all bins; returns [nbin * ny]."""
    lib = _load()
    lam = np.ascontiguousarray(lamda_hk, np.float64)
    opa = np.ascontiguousarray(opac_hk, np.float64)
    edges = np.ascontiguousarray(lamda_int, np.float64)
    dl = np.ascontiguousarray(delta_lamda, np.float64)
    y = np.ascontiguousarray(y_gauss, np.float64)
    nbin = len(edges) - 1
    out = np.empty(nbin * len(y), np.float64)
    lib.kdistr_tp(_ptr(lam), _ptr(opa), len(lam), _ptr(edges), nbin,
                  _ptr(dl), _ptr(y), len(y), _ptr(out))
    return out


def bilinear_tp_native(values, temp_old, press_old, temp_new, press_new):
    """Edge-clamped bilinear (T, log P) regrid of [nt, np, ...]."""
    lib = _load()
    v = np.ascontiguousarray(values, np.float64)
    nt_old, np_old = v.shape[0], v.shape[1]
    inner = int(np.prod(v.shape[2:], dtype=np.int64)) if v.ndim > 2 else 1
    to = np.ascontiguousarray(temp_old, np.float64)
    po = np.ascontiguousarray(press_old, np.float64)
    tn = np.ascontiguousarray(temp_new, np.float64)
    pn = np.ascontiguousarray(press_new, np.float64)
    out = np.empty((len(tn), len(pn)) + v.shape[2:], np.float64)
    lib.bilinear_tp(_ptr(v), nt_old, np_old, inner, _ptr(to), _ptr(po),
                    _ptr(tn), len(tn), _ptr(pn), len(pn), _ptr(out))
    return out
