"""Rotated-polygon IoU: ctypes bindings to the C++ module, numpy fallback.

The evaluator-side counterpart of the reference's DOTA_devkit ``polyiou``
C++/SWIG extension (reference ``metrics/dota_eval.py:37-51``). The shared
library is built lazily with g++ on first use and cached next to the source;
if no compiler is available a pure-numpy Sutherland-Hodgman fallback is used.
(The on-device batched IoU for NMS/scoring lives in ``ops.geometry``.)
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)
_SRC = os.path.join(_NATIVE_DIR, "polyiou.cpp")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _build_library() -> Optional[str]:
    build_dir = os.path.join(_NATIVE_DIR, "build")
    os.makedirs(build_dir, exist_ok=True)
    so_path = os.path.join(build_dir, "libpolyiou.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", so_path, _SRC],
            check=True, capture_output=True,
        )
        return so_path
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logging.warning(f"polyiou C++ build failed ({e}); using numpy fallback")
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    so_path = _build_library()
    if so_path is None:
        return None
    lib = ctypes.CDLL(so_path)
    dbl_p = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
    lib.poly_iou.restype = ctypes.c_double
    lib.poly_iou.argtypes = [dbl_p, dbl_p]
    lib.poly_intersection.restype = ctypes.c_double
    lib.poly_intersection.argtypes = [dbl_p, dbl_p]
    lib.poly_iou_batch.restype = None
    lib.poly_iou_batch.argtypes = [dbl_p, dbl_p, ctypes.c_int, dbl_p]
    lib.poly_iou_matrix.restype = None
    lib.poly_iou_matrix.argtypes = [dbl_p, ctypes.c_int, dbl_p, ctypes.c_int, dbl_p]
    _lib = lib
    return _lib


# --- numpy fallback (Sutherland-Hodgman) -----------------------------------


def _np_clip_halfplane(poly: np.ndarray, e0, e1, orient: float) -> np.ndarray:
    out = []
    n = len(poly)
    for i in range(n):
        cur = poly[i]
        prev = poly[i - 1]
        c_cur = orient * ((e1[0] - e0[0]) * (cur[1] - e0[1]) - (e1[1] - e0[1]) * (cur[0] - e0[0]))
        c_prev = orient * ((e1[0] - e0[0]) * (prev[1] - e0[1]) - (e1[1] - e0[1]) * (prev[0] - e0[0]))
        inside_cur = c_cur >= -1e-12
        inside_prev = c_prev >= -1e-12
        if inside_cur != inside_prev:
            denom = c_prev - c_cur
            if abs(denom) > 1e-300:
                t = c_prev / denom
                out.append(prev + t * (cur - prev))
        if inside_cur:
            out.append(cur)
    return np.array(out) if out else np.zeros((0, 2))


def _np_signed_area(poly: np.ndarray) -> float:
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _np_intersection_area(p: np.ndarray, q: np.ndarray) -> float:
    orient = 1.0 if _np_signed_area(q) >= 0 else -1.0
    cur = p
    for e in range(len(q)):
        if len(cur) == 0:
            return 0.0
        cur = _np_clip_halfplane(cur, q[e], q[(e + 1) % len(q)], orient)
    if len(cur) < 3:
        return 0.0
    return abs(_np_signed_area(cur))


def _as_flat8(poly) -> np.ndarray:
    arr = np.ascontiguousarray(np.asarray(poly, dtype=np.float64).reshape(-1))
    assert arr.shape == (8,), f"expected 4 xy points, got shape {np.shape(poly)}"
    return arr


def poly_intersection(p, q) -> float:
    """Intersection area of two 4-point polygons ((4,2) or flat 8)."""
    lib = _get_lib()
    pf, qf = _as_flat8(p), _as_flat8(q)
    if lib is not None:
        return float(lib.poly_intersection(pf, qf))
    return _np_intersection_area(pf.reshape(4, 2), qf.reshape(4, 2))


def poly_iou(p, q) -> float:
    """IoU of two 4-point polygons."""
    lib = _get_lib()
    pf, qf = _as_flat8(p), _as_flat8(q)
    if lib is not None:
        return float(lib.poly_iou(pf, qf))
    inter = _np_intersection_area(pf.reshape(4, 2), qf.reshape(4, 2))
    pa = abs(_np_signed_area(pf.reshape(4, 2)))
    qa = abs(_np_signed_area(qf.reshape(4, 2)))
    union = pa + qa - inter
    return inter / union if union > 0 else 0.0


def poly_iou_batch(det, gts) -> np.ndarray:
    """IoU of one det polygon vs (N, 4, 2) (or (N, 8)) gt polygons."""
    gts = np.ascontiguousarray(np.asarray(gts, dtype=np.float64).reshape(-1, 8))
    n = len(gts)
    if n == 0:
        return np.zeros(0)
    lib = _get_lib()
    detf = _as_flat8(det)
    if lib is not None:
        out = np.zeros(n, dtype=np.float64)
        lib.poly_iou_batch(detf, gts, n, out)
        return out
    return np.array([poly_iou(detf, g) for g in gts])


def poly_iou_matrix(dets, gts) -> np.ndarray:
    """(N, M) IoU matrix between det and gt polygon sets."""
    dets = np.ascontiguousarray(np.asarray(dets, dtype=np.float64).reshape(-1, 8))
    gts = np.ascontiguousarray(np.asarray(gts, dtype=np.float64).reshape(-1, 8))
    n, m = len(dets), len(gts)
    if n == 0 or m == 0:
        return np.zeros((n, m))
    lib = _get_lib()
    if lib is not None:
        out = np.zeros((n, m), dtype=np.float64)
        lib.poly_iou_matrix(dets, n, gts, m, out)
        return out
    return np.array([[poly_iou(d, g) for g in gts] for d in dets])
