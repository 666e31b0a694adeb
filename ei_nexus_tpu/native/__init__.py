"""Native host-side event rasterization (C++/OpenMP via ctypes).

`lib()` builds (once, cached next to the source) and loads libeventops.so;
the wrappers mirror `ei_nexus_tpu.data.representations` semantics on the
host. Falls back to None when no C++ toolchain is available — callers use
the jax path instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libeventops.so")
_SRC = os.path.join(_HERE, "event_ops.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


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
    i64, i32 = ctypes.c_int64, ctypes.c_int
    L.voxel_grid.argtypes = [_f32p, _f32p, _f64p, _f32p, i64, i32, i32, i32,
                             i32, _f32p]
    L.time_surface.argtypes = [_f32p, _f32p, _f64p, _f32p, i64, i32, i32,
                               i32, _f32p]
    L.event_stack.argtypes = [_f32p, _f32p, _f64p, _f32p, i64, i32, i32,
                              i32, _f32p]
    L.accumulation_image.argtypes = [_f32p, _f32p, i64, i32, i32, _f32p]
    for fn in (L.voxel_grid, L.time_surface, L.event_stack,
               L.accumulation_image):
        fn.restype = None
    _LIB = L
    return _LIB


def _prep(x, y, t, p):
    return (np.ascontiguousarray(x, np.float32),
            np.ascontiguousarray(y, np.float32),
            np.ascontiguousarray(t, np.float64),
            np.ascontiguousarray(p, np.float32))


def voxel_grid(x, y, t, p, bins: int, height: int, width: int,
               normalize: bool = True) -> np.ndarray:
    L = lib()
    assert L is not None, "native event ops unavailable"
    x, y, t, p = _prep(x, y, t, p)
    out = np.empty((bins, height, width), np.float32)
    L.voxel_grid(x, y, t, p, len(x), bins, height, width, int(normalize),
                 out)
    return out


def time_surface(x, y, t, p, bins: int, height: int, width: int
                 ) -> np.ndarray:
    L = lib()
    assert L is not None, "native event ops unavailable"
    x, y, t, p = _prep(x, y, t, p)
    out = np.empty((bins, height, width), np.float32)
    L.time_surface(x, y, t, p, len(x), bins, height, width, out)
    return out


def event_stack(x, y, t, p, bins: int, height: int, width: int
                ) -> np.ndarray:
    L = lib()
    assert L is not None, "native event ops unavailable"
    x, y, t, p = _prep(x, y, t, p)
    out = np.empty((bins, height, width), np.float32)
    L.event_stack(x, y, t, p, len(x), bins, height, width, out)
    return out


def accumulation_image(x, y, height: int, width: int) -> np.ndarray:
    L = lib()
    assert L is not None, "native event ops unavailable"
    x = np.ascontiguousarray(x, np.float32)
    y = np.ascontiguousarray(y, np.float32)
    out = np.empty((height, width), np.float32)
    L.accumulation_image(x, y, len(x), height, width, out)
    return out


def available() -> bool:
    return lib() is not None
