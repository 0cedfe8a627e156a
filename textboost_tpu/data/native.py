"""ctypes bridge to the native C++ image ops (csrc/image_ops.cpp).

Builds the shared library on first use with g++ (cached next to the
source); every entry point has a numpy fallback so zero-toolchain
environments keep working.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc", "image_ops.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libimage_ops.so")


def _build() -> Optional[str]:
    if os.path.isfile(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _SO],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _SO
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
            lib.normalize_u8_to_f32.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ]
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def normalize_u8(arr: np.ndarray, mean: float = 0.5, std: float = 0.5,
                 threads: int = 4) -> np.ndarray:
    """uint8 array -> float32 (x/255 - mean)/std; native when available."""
    assert arr.dtype == np.uint8
    lib = get_lib()
    if lib is None:
        return (arr.astype(np.float32) / 255.0 - mean) / std
    src = np.ascontiguousarray(arr)
    dst = np.empty(src.shape, np.float32)
    lib.normalize_u8_to_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(src.size),
        ctypes.c_float(mean),
        ctypes.c_float(1.0 / std),
        ctypes.c_int(threads),
    )
    return dst
