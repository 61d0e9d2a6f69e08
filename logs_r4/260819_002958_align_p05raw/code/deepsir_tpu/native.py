"""ctypes bindings for the C++ host runtime (native/deepsir_native.cpp).

The native library replaces the compiled third-party extensions of the
reference's data path (Open3D voxel_down_sample / KDTreeFlann /
registration_icp, torch_points_kernels.knn — SURVEY.md §2.4). If the shared
object is missing it is built on first use with `make -C native`; if that
fails (no toolchain), callers fall back to the numpy/scipy implementations
in ops/.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_logger = logging.getLogger("native")
_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_PKG_DIR, "_native.so")
_SRC_DIR = os.path.join(os.path.dirname(_PKG_DIR), "native")

_lib: Optional[ctypes.CDLL] = None
_tried = False

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _SRC_DIR], check=True,
                       capture_output=True, text=True)
        return os.path.exists(_SO_PATH)
    except Exception as exc:  # no toolchain / build failure -> fallback
        _logger.warning("native build failed (%s); using python fallbacks", exc)
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH) and os.path.isdir(_SRC_DIR):
        _build()
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)

    lib.voxel_downsample.restype = ctypes.c_int
    lib.voxel_downsample.argtypes = [_f32p, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_float, _f32p, ctypes.c_int]

    lib.radius_matches.restype = ctypes.c_int
    lib.radius_matches.argtypes = [_f32p, ctypes.c_int, ctypes.c_int,
                                   _f32p, ctypes.c_int, ctypes.c_int,
                                   _f64p, ctypes.c_float, _i32p, ctypes.c_int]

    lib.knn_search.restype = None
    lib.knn_search.argtypes = [_f32p, ctypes.c_int, ctypes.c_int,
                               _f32p, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, _i32p, _f32p]

    lib.icp_point2point.restype = ctypes.c_int
    lib.icp_point2point.argtypes = [_f32p, ctypes.c_int, ctypes.c_int,
                                    _f32p, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_float, _f64p, ctypes.c_int,
                                    ctypes.c_double, _f64p]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def voxel_downsample(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Mean-per-voxel downsample, all channels carried. (V, C) float32."""
    lib = load()
    pts = np.ascontiguousarray(points, dtype=np.float32)
    n, c = pts.shape
    out = np.empty((n, c), dtype=np.float32)
    v = lib.voxel_downsample(pts, n, c, voxel_size, out, n)
    return out[:v].copy()


def radius_matches(src_xyz: np.ndarray, ref_xyz: np.ndarray,
                   trans: np.ndarray, radius: float,
                   max_pairs: int = 2_000_000) -> np.ndarray:
    """(P, 2) int32 pairs with |T src_i - ref_j| < radius.

    The native kernel returns the TRUE pair count even when it exceeds the
    buffer; on overflow we retry once with an exact-size buffer so dense
    clouds / large radii never silently lose GT correspondences (the scipy
    fallback in ops/radius_match.py has no cap either).
    """
    lib = load()
    src = np.ascontiguousarray(src_xyz, dtype=np.float32)
    ref = np.ascontiguousarray(ref_xyz, dtype=np.float32)
    t = np.ascontiguousarray(np.asarray(trans, np.float64)[:3, :4])
    out = np.empty((max_pairs, 2), dtype=np.int32)
    p = lib.radius_matches(src, len(src), src.shape[1], ref, len(ref),
                           ref.shape[1], t, radius, out, max_pairs)
    if p > max_pairs:
        out = np.empty((p, 2), dtype=np.int32)
        p2 = lib.radius_matches(src, len(src), src.shape[1], ref, len(ref),
                                ref.shape[1], t, radius, out, p)
        p = min(p, p2)
    return out[:p].copy()


def knn_search(query: np.ndarray, ref: np.ndarray, k: int
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Exact kNN. Returns (idx (N, k) int32, sq_dist (N, k) float32)."""
    lib = load()
    q = np.ascontiguousarray(query, dtype=np.float32)
    r = np.ascontiguousarray(ref, dtype=np.float32)
    idx = np.empty((len(q), k), dtype=np.int32)
    dist = np.empty((len(q), k), dtype=np.float32)
    lib.knn_search(q, len(q), q.shape[1], r, len(r), r.shape[1], k, idx, dist)
    return idx, dist


def icp_point2point(src: np.ndarray, tgt: np.ndarray, max_corr_dist: float,
                    init: Optional[np.ndarray] = None, max_iter: int = 200,
                    tol: float = 1e-7) -> np.ndarray:
    """Point-to-point ICP; returns a 4x4 float64 transform src -> tgt."""
    lib = load()
    s = np.ascontiguousarray(src[:, :3], dtype=np.float32)
    t = np.ascontiguousarray(tgt[:, :3], dtype=np.float32)
    init12 = np.ascontiguousarray(
        (np.eye(4) if init is None else np.asarray(init, np.float64))[:3, :4])
    out = np.empty((3, 4), dtype=np.float64)
    lib.icp_point2point(s, len(s), 3, t, len(t), 3, max_corr_dist,
                        init12, max_iter, tol, out)
    full = np.eye(4)
    full[:3, :4] = out
    return full
