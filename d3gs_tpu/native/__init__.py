"""Native (C++) host-side helpers with ctypes bindings.

The reference uses CUDA/C++ submodules for its native components
(SURVEY.md §2.3). The TPU compute path is JAX/XLA, but the host-side
runtime pieces are native here too:
  * knn.cpp — grid-accelerated 3-NN mean squared distance (simple-knn
    equivalent) for Gaussian scale init at large N;
  * ply_io.cpp — zero-copy binary PLY vertex block encode/decode for
    large checkpoints.

Libraries build on first use with g++ (no pybind11 in this image; plain C
ABI + ctypes). Every entry point has a pure-JAX/numpy fallback so the
framework works without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS: dict[str, object] = {}


def _build_and_load(name: str, sources: list[str]):
    """Compile (once) and dlopen lib<name>.so; returns None on failure."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        so_path = os.path.join(_HERE, f"lib{name}.so")
        srcs = [os.path.join(_HERE, s) for s in sources]
        try:
            newest_src = max(os.path.getmtime(s) for s in srcs)
            if (not os.path.exists(so_path)
                    or os.path.getmtime(so_path) < newest_src):
                cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                       "-std=c++17", "-o", so_path, *srcs, "-lpthread"]
                subprocess.run(cmd, check=True, capture_output=True)
            lib = ctypes.CDLL(so_path)
        except Exception:
            lib = None
        _LIBS[name] = lib
        return lib


def ply_lib():
    lib = _build_and_load("d3gs_ply", ["ply_io.cpp"])
    if lib is not None and not hasattr(lib, "_configured"):
        lib.ply_transpose_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.ply_transpose_f32.restype = ctypes.c_int
        lib._configured = True
    return lib


def transpose_f32_native(arr: np.ndarray) -> np.ndarray | None:
    """Blocked multithreaded (R, C) f32 -> (C, R) transpose-copy — the hot
    op of Gaussian-checkpoint PLY encode/decode (AoS on disk vs SoA in
    memory). Returns None if the native build is unavailable (callers fall
    back to numpy)."""
    lib = ply_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(arr, dtype=np.float32)
    rows, cols = a.shape
    out = np.empty((cols, rows), np.float32)
    rc = lib.ply_transpose_f32(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), rows, cols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if rc == 0 else None


def knn_lib():
    lib = _build_and_load("d3gs_knn", ["knn.cpp"])
    if lib is not None and not hasattr(lib, "_configured"):
        lib.knn_mean_sq_dist.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.knn_mean_sq_dist.restype = ctypes.c_int
        lib._configured = True
    return lib


def knn_mean_sq_dist_native(points: np.ndarray, k: int = 3) -> np.ndarray:
    """(N, 3) -> (N,) mean squared distance to k nearest neighbors.
    Falls back to the numpy implementation if the native build failed."""
    lib = knn_lib()
    pts = np.ascontiguousarray(points, dtype=np.float32)
    n = pts.shape[0]
    if lib is None:
        from ..ops.knn import knn_mean_sq_dist_np
        return knn_mean_sq_dist_np(pts, k)
    out = np.empty(n, dtype=np.float32)
    rc = lib.knn_mean_sq_dist(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        from ..ops.knn import knn_mean_sq_dist_np
        return knn_mean_sq_dist_np(pts, k)
    return out
