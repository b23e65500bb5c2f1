"""C++ LSD line-segment detector with a ctypes binding.

Mirrors the reference's native choice: fkluger/vanishing_points_2017 uses a
C/Cython ``lsdpython`` submodule (``evaluation.py:7,238``; ``.gitmodules``).
Here the detector is a from-scratch C++ implementation (``lsd.cpp``) built
on demand with g++ and loaded via ctypes — no pybind11 dependency.

Contract (same as the reference's call site, ``evaluation.py:229-251``):
``detect_line_segments(image)`` takes a 2-D float64 grayscale image scaled
to [0, 255] and returns an (N, 7) array whose columns 0-3 are the segment
endpoints in pixels and column 6 is -log10(NFA).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "lsd.cpp")
_SO = os.path.join(_HERE, "_liblsd.so")
_lock = threading.Lock()
_lib = None


def _build(native: bool = True) -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    if native:
        cmd.insert(2, "-march=native")
    subprocess.run(cmd, check=True, capture_output=True)


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.lsd_detect.restype = ctypes.c_int
    lib.lsd_detect.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.c_int)]
    lib.lsd_free.restype = None
    lib.lsd_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
    return lib


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        try:
            lib = _bind(ctypes.CDLL(_SO))
        except OSError:
            # a stale or foreign-ISA binary (e.g. copied between machines,
            # built with -march=native elsewhere): rebuild conservatively
            _build(native=False)
            lib = _bind(ctypes.CDLL(_SO))
        _lib = lib
        return lib


def detect_line_segments(image: np.ndarray) -> np.ndarray:
    """Run LSD. image: (H, W) float64 grayscale in [0, 255].

    Returns (N, 7): x1, y1, x2, y2, width, precision, -log10(NFA).
    """
    lib = _load()
    img = np.ascontiguousarray(image, dtype=np.float64)
    if img.ndim != 2:
        raise ValueError("expected a 2-D grayscale image")
    h, w = img.shape
    out = ctypes.POINTER(ctypes.c_double)()
    n = ctypes.c_int()
    rc = lib.lsd_detect(img.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                        w, h, ctypes.byref(out), ctypes.byref(n))
    if rc != 0:
        raise RuntimeError(f"lsd_detect failed with code {rc}")
    try:
        if n.value == 0:
            return np.zeros((0, 7), np.float64)
        arr = np.ctypeslib.as_array(out, shape=(n.value, 7)).copy()
    finally:
        lib.lsd_free(out)
    return arr
