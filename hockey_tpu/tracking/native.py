"""ctypes bindings for the native host runtime (native/hockey_host.cpp).

Auto-builds the shared library with make/g++ on first import when a
toolchain is present; otherwise every entry point falls back to
numpy/scipy so the framework never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhockey_host.so")

_lib: Optional[ctypes.CDLL] = None


def _try_build() -> None:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        pass


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _try_build()
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.iou_matrix.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.solve_lsap.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.solve_lsap.restype = ctypes.c_int32
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, 4) x (M, 4) xyxy -> (N, M) IoU. Native when built."""
    a = np.ascontiguousarray(a, np.float32).reshape(-1, 4)
    b = np.ascontiguousarray(b, np.float32).reshape(-1, 4)
    n, m = len(a), len(b)
    lib = _load()
    if lib is None or n == 0 or m == 0:
        return _iou_numpy(a, b)
    out = np.empty((n, m), np.float32)
    lib.iou_matrix(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), m,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def _iou_numpy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return (inter / np.maximum(aa[:, None] + ab[None, :] - inter, 1e-7)).astype(np.float32)


def linear_sum_assignment(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Minimize sum of assigned costs; scipy-compatible return
    (row_indices, col_indices). Native JV solver when built."""
    cost = np.ascontiguousarray(cost, np.float64)
    n, m = cost.shape
    lib = _load()
    if lib is None or n == 0 or m == 0:
        import scipy.optimize

        return scipy.optimize.linear_sum_assignment(cost)
    transposed = n > m
    work = np.ascontiguousarray(cost.T) if transposed else cost
    wn, wm = work.shape
    out = np.full(wn, -1, np.int32)
    rc = lib.solve_lsap(
        work.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), wn, wm,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        import scipy.optimize

        return scipy.optimize.linear_sum_assignment(cost)
    rows = np.arange(wn)
    if transposed:
        return out.astype(np.int64), rows.astype(np.int64)
    return rows.astype(np.int64), out.astype(np.int64)
