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
            # -ffp-contract=off: FMA contraction perturbs the double
            # arithmetic that affine_scale_bicubic_u8 must keep bit-exact
            # to PIL's (truncation boundaries flip on ~1% of pixels).
            ["g++", "-O3", "-ffp-contract=off", "-shared", "-fPIC",
             "-std=c++17", "-pthread", _SRC, "-o", _SO],
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
            lib.affine_scale_bicubic_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                ctypes.c_double,
            ]
            _LIB = lib
        except (OSError, AttributeError):
            _LIB = None
        return _LIB


def affine_scale_bicubic(arr: np.ndarray, pad_w: int, pad_h: int,
                         out_w: int, out_h: int, a0: float, a2: float,
                         a4: float, a5: float) -> Optional[np.ndarray]:
    """Axis-aligned bicubic affine resample over an edge-padded extent,
    bit-exact to PIL Image.transform(AFFINE, BICUBIC) on np.pad(edge).
    The pad is virtual (index clamping).  Returns None when the native
    library is unavailable (caller falls back to PIL)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "affine_scale_bicubic_u8"):
        return None
    assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3
    src = np.ascontiguousarray(arr)
    dst = np.empty((out_h, out_w, 3), np.uint8)
    lib.affine_scale_bicubic_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(src.shape[0]), ctypes.c_int32(src.shape[1]),
        ctypes.c_int32(pad_w), ctypes.c_int32(pad_h),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(out_h), ctypes.c_int32(out_w),
        ctypes.c_double(a0), ctypes.c_double(a2),
        ctypes.c_double(a4), ctypes.c_double(a5),
    )
    return dst


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
