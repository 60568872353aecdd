"""ctypes bindings for the in-repo C++ host kernels (csrc/wesup_native.cpp).

Auto-builds the shared library with g++ on first use (cached next to the
source); every entry point has a scipy fallback so the framework works even
without a toolchain.

Provided:
    label8(mask)             -- 8-connectivity CCL (skimage.label semantics)
    edt_sq(mask)             -- exact squared EDT to the nonzero set
    hausdorff(a, b)          -- symmetric Hausdorff, O(N) via EDT
    flip_small_regions(m, t) -- evaluation postprocess region flipping
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_LIB_PATH = _CSRC / "libwesup_native.so"
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not _LIB_PATH.exists() or (
                    (_CSRC / "wesup_native.cpp").stat().st_mtime
                    > _LIB_PATH.stat().st_mtime):
                subprocess.run(["make", "-C", str(_CSRC)], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(str(_LIB_PATH))
        except Exception:
            _build_failed = True
            return None

        lib.ccl_label.restype = ctypes.c_int32
        lib.ccl_label.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32)]
        lib.edt_sq.restype = None
        lib.edt_sq.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float)]
        lib.hausdorff_dist.restype = ctypes.c_double
        lib.hausdorff_dist.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32, ctypes.c_int32]
        lib.flip_small_regions.restype = None
        lib.flip_small_regions.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int64]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _as_u8(mask) -> np.ndarray:
    m = np.ascontiguousarray(np.asarray(mask) > 0, dtype=np.uint8)
    if m.ndim != 2:
        raise ValueError(f"expected 2-D mask, got shape {m.shape}")
    return m


def label8(mask) -> np.ndarray:
    lib = _load()
    m = _as_u8(mask)
    if lib is None:
        from scipy import ndimage

        lab, _ = ndimage.label(m, structure=np.ones((3, 3)))
        return lab.astype(np.int32)
    h, w = m.shape
    out = np.empty((h, w), np.int32)
    lib.ccl_label(m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
                  out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def edt_sq(mask) -> np.ndarray:
    lib = _load()
    m = _as_u8(mask)
    if lib is None:
        from scipy import ndimage

        d = ndimage.distance_transform_edt(~m.astype(bool))
        return (d * d).astype(np.float32)
    h, w = m.shape
    out = np.empty((h, w), np.float32)
    lib.edt_sq(m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
               out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def hausdorff(a, b) -> float:
    lib = _load()
    ma, mb = _as_u8(a), _as_u8(b)
    if ma.shape != mb.shape:
        raise ValueError("mask shapes differ")
    if lib is None:
        from scipy.spatial.distance import directed_hausdorff

        if ma.sum() == 0 and mb.sum() == 0:
            return 0.0
        if ma.sum() == 0 or mb.sum() == 0:
            return float(np.inf)
        Ac = np.column_stack(np.where(ma))
        Bc = np.column_stack(np.where(mb))
        return float(max(directed_hausdorff(Ac, Bc)[0],
                         directed_hausdorff(Bc, Ac)[0]))
    h, w = ma.shape
    return float(lib.hausdorff_dist(
        ma.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w))


def flip_small_regions(mask, threshold: int) -> np.ndarray:
    lib = _load()
    m = _as_u8(mask)
    if lib is None:
        from ..ops.morphology import flip_small_regions as _py

        return _py(m, threshold)
    h, w = m.shape
    lib.flip_small_regions(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        int(threshold))
    return m
