"""ctypes bindings to the native host-geometry library (native/geometry.cpp).

Auto-builds libiblgeom.so with `make` on first use if missing; every entry
point has a pure-python fallback so nothing hard-depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libiblgeom.so"))
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    c_float_p = ctypes.POINTER(ctypes.c_float)
    lib.dbscan_points.argtypes = [c_float_p, ctypes.c_int64, ctypes.c_double,
                                  ctypes.c_int32,
                                  ctypes.POINTER(ctypes.c_int32)]
    lib.radius_outlier.argtypes = [c_float_p, ctypes.c_int64, ctypes.c_double,
                                   ctypes.c_int32,
                                   ctypes.POINTER(ctypes.c_uint8)]
    lib.voxel_downsample.argtypes = [c_float_p, c_float_p, ctypes.c_int64,
                                     ctypes.c_double, c_float_p, c_float_p]
    lib.voxel_downsample.restype = ctypes.c_int64
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _as_f32(arr):
    return np.ascontiguousarray(arr, dtype=np.float32)


def dbscan_native(points: np.ndarray, eps: float, min_points: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    pts = _as_f32(points)
    n = len(pts)
    labels = np.empty(n, np.int32)
    lib.dbscan_points(pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                      n, float(eps), int(min_points),
                      labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return labels


def radius_outlier_native(points: np.ndarray, radius: float,
                          nb_points: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    pts = _as_f32(points)
    n = len(pts)
    keep = np.empty(n, np.uint8)
    lib.radius_outlier(pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       n, float(radius), int(nb_points),
                       keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return keep.astype(bool)


def voxel_downsample_native(points: np.ndarray, colors: np.ndarray | None,
                            voxel: float):
    lib = _load()
    if lib is None:
        return None
    pts = _as_f32(points)
    n = len(pts)
    out_pts = np.empty((n, 3), np.float32)
    if colors is not None:
        cols = _as_f32(colors)
        out_cols = np.empty((n, 3), np.float32)
        k = lib.voxel_downsample(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cols.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, float(voxel),
            out_pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_cols.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out_pts[:k].copy(), out_cols[:k].copy()
    k = lib.voxel_downsample(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), None,
        n, float(voxel),
        out_pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), None)
    return out_pts[:k].copy(), None
