"""ctypes binding to the C++ S2 extension (geo/cpp/s2geo.cpp).

Used transparently by hot batch paths when built (`make -C
geoestimation_tpu/geo/cpp`); the numpy implementation in `s2.py` is the
always-available reference. `GEOESTIMATION_NO_NATIVE_S2=1` disables it.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False
_SO_PATH = os.path.join(os.path.dirname(__file__), "cpp", "libs2geo.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("GEOESTIMATION_NO_NATIVE_S2") == "1":
        return None
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.s2_latlng_to_cell_id.argtypes = [f64p, f64p, ctypes.c_int64,
                                             u64p, ctypes.c_int]
        lib.s2_parent_at_level.argtypes = [u64p, ctypes.c_int64,
                                           ctypes.c_int, u64p, ctypes.c_int]
        lib.s2_cell_level.argtypes = [u64p, ctypes.c_int64, i32p,
                                      ctypes.c_int]
        lib.s2_cell_id_to_latlng.argtypes = [u64p, ctypes.c_int64, f64p,
                                             f64p, ctypes.c_int]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def latlng_to_cell_id(lat, lng, n_threads=0):
    lib = _load()
    lat = np.ascontiguousarray(lat, np.float64)
    lng = np.ascontiguousarray(lng, np.float64)
    out = np.empty(lat.shape, np.uint64)
    lib.s2_latlng_to_cell_id(lat.ravel(), lng.ravel(), lat.size,
                             out.ravel(), n_threads)
    return out


def parent_at_level(ids, level, n_threads=0):
    lib = _load()
    ids = np.ascontiguousarray(ids, np.uint64)
    out = np.empty(ids.shape, np.uint64)
    lib.s2_parent_at_level(ids.ravel(), ids.size, int(level), out.ravel(),
                           n_threads)
    return out


def cell_level(ids, n_threads=0):
    lib = _load()
    ids = np.ascontiguousarray(ids, np.uint64)
    out = np.empty(ids.shape, np.int32)
    lib.s2_cell_level(ids.ravel(), ids.size, out.ravel(), n_threads)
    return out


def cell_id_to_latlng(ids, n_threads=0):
    lib = _load()
    ids = np.ascontiguousarray(ids, np.uint64)
    lat = np.empty(ids.shape, np.float64)
    lng = np.empty(ids.shape, np.float64)
    lib.s2_cell_id_to_latlng(ids.ravel(), ids.size, lat.ravel(),
                             lng.ravel(), n_threads)
    return lat, lng
