"""Native (C++) host-side components, bound via ctypes.

Build: ``make -C surfacenet_tpu/native`` (or the lazy auto-build below on
first import).  Falls back silently to the numpy implementations in
pipeline/sparse.py when the toolchain or .so is unavailable — the native
path is a performance feature, not a correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_merge.so")
_SRCS = [os.path.join(_DIR, "merge.cpp"), os.path.join(_DIR, "denoise.cpp")]

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                "-o", _SO, *_SRCS,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _stale() -> bool:
    if not os.path.exists(_SO):
        return True
    so_mtime = os.path.getmtime(_SO)
    return any(
        os.path.exists(s) and os.path.getmtime(s) > so_mtime for s in _SRCS
    )


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if _stale():
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    lib.sn_containment.restype = None
    lib.sn_containment.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.sn_merge.restype = ctypes.c_int64
    lib.sn_merge.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.sn_pack_keys.restype = None
    lib.sn_pack_keys.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.sn_components.restype = ctypes.c_int64
    lib.sn_components.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def native_merge(
    coords: np.ndarray,  # (N, 3) int64
    probs: np.ndarray,  # (N,) f32
    colors: np.ndarray,  # (N, 3) f32
    done_grid: np.ndarray,  # (M, 3) int64 cube grid indices marked done
    stride: int,
    D: int,
    vote_threshold: float,
):
    """Native overlap merge; returns (coords, probs, colors) of survivors,
    or None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None

    coords = np.ascontiguousarray(coords, np.int64)
    probs = np.ascontiguousarray(probs, np.float32)
    colors = np.ascontiguousarray(colors, np.float32)
    done_grid = np.ascontiguousarray(done_grid, np.int64)
    n = len(coords)
    m = len(done_grid)

    keys = np.empty(m, np.uint64)
    lib.sn_pack_keys(_ptr(done_grid, ctypes.c_int64), m,
                     _ptr(keys, ctypes.c_uint64))

    contain = np.empty(n, np.float32)
    lib.sn_containment(
        _ptr(coords, ctypes.c_int64), n,
        _ptr(keys, ctypes.c_uint64), m,
        stride, D, _ptr(contain, ctypes.c_float),
    )

    out_coords = np.empty((n, 3), np.int64)
    out_probs = np.empty(n, np.float32)
    out_colors = np.empty((n, 3), np.float32)
    kept = lib.sn_merge(
        _ptr(coords, ctypes.c_int64), _ptr(probs, ctypes.c_float),
        _ptr(colors, ctypes.c_float), _ptr(contain, ctypes.c_float),
        n, vote_threshold,
        _ptr(out_coords, ctypes.c_int64), _ptr(out_probs, ctypes.c_float),
        _ptr(out_colors, ctypes.c_float),
    )
    return out_coords[:kept], out_probs[:kept], out_colors[:kept]


def native_components(coords: np.ndarray):
    """26-connected components of (N, 3) int voxel coords via the C++
    union-find; returns (labels, sizes) int64 arrays (labels compact in
    [0, n_components), sizes per-record component size), or None when the
    native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, np.int64)
    n = len(coords)
    labels = np.empty(n, np.int64)
    sizes = np.empty(n, np.int64)
    lib.sn_components(
        _ptr(coords, ctypes.c_int64), n,
        _ptr(labels, ctypes.c_int64), _ptr(sizes, ctypes.c_int64),
    )
    return labels, sizes
