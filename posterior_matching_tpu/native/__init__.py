"""Native (C++) host-side kernels, loaded via ctypes.

Builds ``pm_data.cc`` on first use with g++ (cached next to the source) and
exposes the batch-assembly kernels. Falls back cleanly when no compiler is
available: callers check :func:`available` and use numpy.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pm_data.cc")
_LIB = os.path.join(_DIR, "libpm_data.so")

_lock = threading.Lock()
_lib = None
_tried = False

_DEFAULT_THREADS = min(8, os.cpu_count() or 1)


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(
            _LIB
        ) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.pm_gather_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ]
        lib.pm_gather_u8_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_float, ctypes.c_int,
        ]
        lib.pm_gather_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def gather_rows(src: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """out[i] = src[indices[i]] for C-contiguous arrays of any dtype."""
    lib = _load()
    assert lib is not None
    src = np.ascontiguousarray(src)
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    out = np.empty((len(idx), *src.shape[1:]), src.dtype)
    row_bytes = src.dtype.itemsize * int(np.prod(src.shape[1:], initial=1))
    lib.pm_gather_rows(
        src.ctypes.data, idx.ctypes.data, out.ctypes.data,
        len(idx), row_bytes, _DEFAULT_THREADS,
    )
    return out


def gather_u8_to_f32(
    src: np.ndarray, indices: np.ndarray, scale: float = 1.0 / 255.0
) -> np.ndarray:
    """Fused shuffled gather + uint8 -> float32 * scale (the image-batch
    assembly path)."""
    lib = _load()
    assert lib is not None
    assert src.dtype == np.uint8
    src = np.ascontiguousarray(src)
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    out = np.empty((len(idx), *src.shape[1:]), np.float32)
    row_elems = int(np.prod(src.shape[1:], initial=1))
    lib.pm_gather_u8_to_f32(
        src.ctypes.data, idx.ctypes.data, out.ctypes.data,
        len(idx), row_elems, ctypes.c_float(scale), _DEFAULT_THREADS,
    )
    return out


def gather_f32(src: np.ndarray, indices: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    assert src.dtype == np.float32
    src = np.ascontiguousarray(src)
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    out = np.empty((len(idx), *src.shape[1:]), np.float32)
    row_elems = int(np.prod(src.shape[1:], initial=1))
    lib.pm_gather_f32(
        src.ctypes.data, idx.ctypes.data, out.ctypes.data,
        len(idx), row_elems, _DEFAULT_THREADS,
    )
    return out
