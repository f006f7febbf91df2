"""Native (C++) host runtime: fused clip assembly for the input pipeline.

Builds `libclipops.so` from clipops.cpp on first use (g++ -O3, cached next
to the source) and binds it via ctypes. Every entry point has a numpy
fallback so the framework runs without a compiler; `available()` reports
which path is active. See clipops.cpp for the layout contracts.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "clipops.cpp")
_LIB = os.path.join(_DIR, "libclipops.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB, _SRC, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (os.path.getmtime(_LIB)
                                        < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.clip_window_f32.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),          # frames
                ctypes.c_int, ctypes.c_int, ctypes.c_int,  # T0, H, W
                ctypes.POINTER(ctypes.c_float),           # out
                ctypes.c_int, ctypes.c_int, ctypes.c_int,  # T, S, start
                ctypes.c_int, ctypes.c_int, ctypes.c_int,  # y0, x0, s
                ctypes.c_int,                              # n_threads
            ]
            lib.clip_window_f32.restype = None
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def clip_window(frames: np.ndarray, t: int, size: int, start: int,
                n_threads: int = 0) -> np.ndarray:
    """uint8 (T0, H, W, 3) -> float32 (t, size, size, 3) in [-1, 1]:
    window at `start` (wrapping), center-crop, nearest-resize, normalize.
    Uses the native kernel when available, numpy otherwise."""
    t0, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    s = min(h, w)
    y0, x0 = (h - s) // 2, (w - s) // 2

    lib = _load()
    if lib is not None:
        frames = np.ascontiguousarray(frames)
        out = np.empty((t, size, size, 3), np.float32)
        lib.clip_window_f32(
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            t0, h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            t, size, start, y0, x0, s, n_threads)
        return out

    # numpy fallback (bit-identical contract)
    sel = (start + np.arange(t)) % t0
    clip = frames[sel, y0:y0 + s, x0:x0 + s].astype(np.float32) / 255.0
    idx = np.minimum((np.arange(size) * s) // size, s - 1)
    clip = clip[:, idx][:, :, idx]
    return 2.0 * clip - 1.0
