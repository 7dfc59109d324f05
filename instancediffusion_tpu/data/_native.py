"""ctypes bindings for the native data-ops library (native/dataops.cpp).

Auto-builds on first import when g++ is available; every entry point has a
NumPy fallback in data/geometry.py, so the framework works without the
native lib (it's a throughput optimization for the host input pipeline)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "..", "native")


def get_lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    d = os.path.abspath(_native_dir())
    so = os.path.join(d, "libdataops.so")
    if not os.path.exists(so) and os.path.exists(os.path.join(d, "Makefile")):
        try:
            subprocess.run(
                ["make", "-C", d], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    lib.rle_decode.restype = ctypes.c_int
    lib.rle_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.rle_encode.restype = ctypes.c_int64
    lib.rle_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int64,
    ]
    lib.rasterize_boxes.restype = None
    lib.rasterize_boxes.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.normalize_image.restype = None
    lib.normalize_image.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    _LIB = lib
    return _LIB


def rle_decode_native(counts: bytes, h: int, w: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros((h, w), np.uint8)
    rc = lib.rle_decode(
        counts, len(counts), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None


def rle_encode_native(mask: np.ndarray) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    cap = 2 * h * w + 64
    buf = ctypes.create_string_buffer(cap)
    n = lib.rle_encode(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, buf, cap
    )
    return buf.raw[:n] if n >= 0 else None


def normalize_image_native(img: np.ndarray) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty(img.shape, np.float32)
    lib.normalize_image(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), img.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
