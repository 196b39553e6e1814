"""ctypes bridge to the native (C++) host components.

The reference's scene-build path is native code (Rust: BVH build
src/bvh.rs, PLY load via plydough); this module provides the TPU
framework's native equivalents, compiled on first use with g++ (the image
has no pybind11; plain C ABI + ctypes keeps the toolchain dependency-free).
Every native entry point has a pure-Python fallback — `FOUNTAIN_TPU_NATIVE=0`
disables the bridge entirely (used by tests to cross-check outputs).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libfountain_native.so")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("FOUNTAIN_TPU_NATIVE", "1") == "0":
            return None
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               capture_output=True, check=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.lbvh_build.restype = ctypes.c_int
            lib.lbvh_build.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def lbvh_build(bounds_min: np.ndarray, bounds_max: np.ndarray,
               leaf_size: int):
    """Native LBVH build; returns (nodes_min, nodes_max, meta, order) or
    None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(bounds_min)
    bmin = np.ascontiguousarray(bounds_min, np.float32)
    bmax = np.ascontiguousarray(bounds_max, np.float32)
    cap = 2 * n + 1
    nodes_min = np.empty((cap, 3), np.float32)
    nodes_max = np.empty((cap, 3), np.float32)
    meta = np.empty((cap, 3), np.int32)
    order = np.empty((n,), np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    m = lib.lbvh_build(
        bmin.ctypes.data_as(fp), bmax.ctypes.data_as(fp), n, int(leaf_size),
        nodes_min.ctypes.data_as(fp), nodes_max.ctypes.data_as(fp),
        meta.ctypes.data_as(ip), order.ctypes.data_as(ip))
    if m <= 0:
        return None
    return nodes_min[:m].copy(), nodes_max[:m].copy(), meta[:m].copy(), order
