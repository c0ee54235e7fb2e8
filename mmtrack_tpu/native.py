"""ctypes bindings for the native region library (native/region.cc).

Replaces the reference's vendored VOT region C library (present only as a
compiled leftover, RGBD/models/SPT/build/.../region.o): exact polygon
overlap for rotated-box VOT annotations and a threaded batch IoU fast path
for analysis sweeps. Builds on demand with g++; numpy fallbacks keep every
caller functional without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libregion.so"))
_SRC_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "region.cc"))

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO_PATH, _SRC_PATH,
             "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_region_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    D = ctypes.POINTER(ctypes.c_double)
    lib.region_polygon_iou.restype = ctypes.c_double
    lib.region_polygon_iou.argtypes = [D, D, ctypes.c_int, D, D, ctypes.c_int,
                                       ctypes.c_int]
    lib.region_batch_iou_xywh.restype = None
    lib.region_batch_iou_xywh.argtypes = [D, D, D, ctypes.c_int, ctypes.c_int]
    lib.region_polygon_bounds.restype = None
    lib.region_polygon_bounds.argtypes = [D, D, ctypes.c_int, D]
    _lib = lib
    return lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def polygon_iou(poly1: np.ndarray, poly2: np.ndarray,
                samples: int = 512) -> float:
    """IoU of two polygons given as (N, 2) float arrays of (x, y) points."""
    p1 = np.ascontiguousarray(poly1, np.float64)
    p2 = np.ascontiguousarray(poly2, np.float64)
    lib = load_region_lib()
    if lib is not None:
        xs1 = np.ascontiguousarray(p1[:, 0])
        ys1 = np.ascontiguousarray(p1[:, 1])
        xs2 = np.ascontiguousarray(p2[:, 0])
        ys2 = np.ascontiguousarray(p2[:, 1])
        return float(lib.region_polygon_iou(
            _ptr(xs1), _ptr(ys1), len(p1), _ptr(xs2), _ptr(ys2), len(p2),
            samples))
    return _polygon_iou_np(p1, p2, samples)


def _polygon_iou_np(p1, p2, samples):
    """Pure-numpy fallback (same rasterized semantics)."""
    from matplotlib.path import Path
    allpts = np.concatenate([p1, p2])
    x0, y0 = allpts.min(0)
    x1, y1 = allpts.max(0)
    if x1 <= x0 or y1 <= y0:
        return 0.0
    xs = x0 + (np.arange(samples) + 0.5) * (x1 - x0) / samples
    ys = y0 + (np.arange(samples) + 0.5) * (y1 - y0) / samples
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1)
    in1 = Path(p1).contains_points(pts)
    in2 = Path(p2).contains_points(pts)
    union = (in1 | in2).sum()
    return float((in1 & in2).sum() / union) if union else 0.0


def batch_iou_xywh(a: np.ndarray, b: np.ndarray,
                   num_threads: int | None = None) -> np.ndarray:
    """Elementwise IoU of (N, 4) xywh arrays — native threaded fast path."""
    a = np.ascontiguousarray(a, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    lib = load_region_lib()
    if lib is None:
        from mmtrack_tpu.eval.metrics import iou_xywh
        return iou_xywh(a, b)
    out = np.empty(len(a), np.float64)
    nt = num_threads if num_threads is not None else (os.cpu_count() or 1)
    lib.region_batch_iou_xywh(_ptr(a), _ptr(b), _ptr(out), len(a), nt)
    return out


def polygon_to_xywh(poly: np.ndarray) -> np.ndarray:
    """Bounding xywh of a VOT polygon annotation."""
    p = np.ascontiguousarray(poly, np.float64)
    lib = load_region_lib()
    if lib is not None:
        out = np.empty(4, np.float64)
        xs = np.ascontiguousarray(p[:, 0])
        ys = np.ascontiguousarray(p[:, 1])
        lib.region_polygon_bounds(_ptr(xs), _ptr(ys), len(p), _ptr(out))
        return out
    x0, y0 = p.min(0)
    x1, y1 = p.max(0)
    return np.asarray([x0, y0, x1 - x0, y1 - y0])
