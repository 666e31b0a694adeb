"""Native host-side event wire encoder (C++/OpenMP via ctypes).

`lib()` builds (once, cached next to the source) and loads libeventops.so.
The single entry point, `compact_encode`, fuses the production H2D wire
encode (train/steps.py compact_event_view: float event arrays -> uint16
fixed-point coords + uint8 polarity + per-row valid counts) into one
parallel pass — numpy needs ~6 full passes over the ~17 MB batch. Falls
back to None when no C++ toolchain is available; callers use the numpy
path instead.

The representation math itself (voxelization, time surfaces, occupancy)
runs ON DEVICE (data/representations.py) — a deliberate design departure
from the reference's host-side per-event python loops
(ref:datasets/visualize.py:23-50, representations.py:67), so no host
rasterizer lives here.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libeventops.so")
_SRC = os.path.join(_HERE, "event_ops.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def build(force: bool = False) -> Optional[str]:
    """Compile the shared library if needed. Returns its path or None."""
    with _LOCK:
        if os.path.exists(_SO) and not force and \
                os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return _SO
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
               "-march=native", _SRC, "-o", _SO]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            try:  # retry without -march=native (portable fallback)
                cmd.remove("-march=native")
                subprocess.run(cmd, check=True, capture_output=True)
            except (OSError, subprocess.CalledProcessError):
                return None
        return _SO


def lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = build()
    if path is None:
        return None
    L = ctypes.CDLL(path)
    i64 = ctypes.c_int64
    L.compact_encode.argtypes = [_f32p, _f32p, _f32p, _u8p, i64, i64,
                                 ctypes.c_float, _u16p, _u16p, _u8p, _i32p]
    L.compact_encode.restype = None
    _LIB = L
    return _LIB


def compact_encode(x: np.ndarray, y: np.ndarray, p: np.ndarray,
                   valid: np.ndarray, scale: float
                   ) -> Optional[Tuple[np.ndarray, ...]]:
    """(B, L) float event arrays -> (xq u16, yq u16, pq u8, n i32) in one
    fused OpenMP pass, or None when the native library is unavailable or
    the inputs do not match the fast path's layout."""
    L = lib()
    if L is None:
        return None
    if not (x.dtype == y.dtype == p.dtype == np.float32) or x.ndim != 2:
        return None
    x = np.ascontiguousarray(x)
    y = np.ascontiguousarray(y)
    p = np.ascontiguousarray(p)
    v = np.ascontiguousarray(valid).view(np.uint8)
    B, n_ev = x.shape
    xq = np.empty((B, n_ev), np.uint16)
    yq = np.empty((B, n_ev), np.uint16)
    pq = np.empty((B, n_ev), np.uint8)
    n = np.empty((B,), np.int32)
    L.compact_encode(x, y, p, v, B, n_ev, np.float32(scale), xq, yq, pq, n)
    return xq, yq, pq, n
