"""ctypes bindings for the native (C++) runtime library.

The reference keeps its grid-construction runtime in C++; this module loads
``native/libhf2d_native.so`` (built by ``make -C native``) and exposes the
accelerated host-side primitives.  Every entry point has a pure-numpy
fallback in the geometry package, so the native library is an optimization,
not a requirement — ``available()`` reports whether it loaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib_path():
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "native", "libhf2d_native.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        # try to build it once
        try:
            subprocess.run(["make", "-C", os.path.dirname(path)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.hf2d_flood_fill.restype = ctypes.c_int64
    lib.hf2d_flood_fill.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
    lib.hf2d_min_wall_distance.restype = None
    lib.hf2d_min_wall_distance.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32)]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _p8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _p32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _pf(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def flood_fill(unset: np.ndarray, sx: int, sy: int) -> np.ndarray:
    """Native 4-connected flood fill; returns bool region mask."""
    lib = _load()
    X, Y = unset.shape
    u8 = np.ascontiguousarray(unset, np.uint8)
    out = np.zeros((X, Y), np.uint8)
    r = lib.hf2d_flood_fill(_p8(u8), _p8(out), X, Y, sx, sy)
    if r < 0:
        raise ValueError(f"flood fill failed at seed ({sx},{sy}): {r}")
    return out.astype(bool)


def min_wall_distance(wall_nodes: np.ndarray, active: np.ndarray,
                      dx: float, dy: float, x0: float, l_init: float):
    """Native nearest-wall transform (reference tie-break semantics).
    Returns (l_min, i_wall, j_wall) for active nodes (others zero)."""
    lib = _load()
    X, Y = active.shape
    wi = np.ascontiguousarray(wall_nodes[:, 0], np.int32)
    wj = np.ascontiguousarray(wall_nodes[:, 1], np.int32)
    act = np.ascontiguousarray(active, np.uint8)
    l_min = np.zeros((X, Y), np.float64)
    i_wall = np.zeros((X, Y), np.int32)
    j_wall = np.zeros((X, Y), np.int32)
    lib.hf2d_min_wall_distance(_p32(wi), _p32(wj), len(wi), _p8(act),
                               X, Y, dx, dy, x0, l_init,
                               _pf(l_min), _p32(i_wall), _p32(j_wall))
    return l_min, i_wall, j_wall
