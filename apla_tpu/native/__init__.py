"""ctypes bindings for the native image kernels (see image_ops.cpp).

The library is compiled on first import (g++, cached next to the source);
all entry points release the GIL, so the threaded DataLoader gets real
parallelism.  Falls back to None if no compiler is available — callers must
check `lib is not None`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "image_ops.cpp")
_SO = os.path.join(_HERE, "libimage_ops.so")
_lock = threading.Lock()

lib = None


def _build() -> bool:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global lib
    with _lock:
        if lib is not None:
            return lib
        if not _build():
            return None
        L = ctypes.CDLL(_SO)
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i = ctypes.c_int
        L.resize_bilinear_u8.argtypes = [u8p, i, i, i, u8p, i, i]
        L.crop_resize_normalize.argtypes = [u8p, i, i, i, i, i, i, i,
                                            f32p, i, i, f32p, f32p]
        L.normalize_u8.argtypes = [u8p, i, i, f32p, f32p, f32p]
        L.hflip_u8.argtypes = [u8p, i, i, i]
        lib = L
        return lib


def available() -> bool:
    return _load() is not None


def resize_bilinear(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """uint8 HWC -> uint8 HWC."""
    L = _load()
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    out = np.empty((dh, dw, c), np.uint8)
    L.resize_bilinear_u8(img, h, w, c, out, dh, dw)
    return out


def crop_resize_normalize(img: np.ndarray, box, dh: int, dw: int,
                          mean, std) -> np.ndarray:
    """Fused crop(y, x, h, w) -> resize -> normalize.  uint8 HWC in,
    float32 HWC out."""
    L = _load()
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    cy, cx, chh, cww = box
    out = np.empty((dh, dw, c), np.float32)
    mean = np.ascontiguousarray(np.asarray(mean, np.float32))
    std = np.ascontiguousarray(np.asarray(std, np.float32))
    L.crop_resize_normalize(img, h, w, c, cy, cx, chh, cww, out, dh, dw,
                            mean, std)
    return out


def normalize(img: np.ndarray, mean, std) -> np.ndarray:
    """uint8 HWC -> float32 HWC normalized."""
    L = _load()
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    out = np.empty((h, w, c), np.float32)
    mean = np.ascontiguousarray(np.asarray(mean, np.float32))
    std = np.ascontiguousarray(np.asarray(std, np.float32))
    L.normalize_u8(img, h * w, c, mean, std, out)
    return out


def hflip(img: np.ndarray) -> np.ndarray:
    L = _load()
    img = np.ascontiguousarray(img.copy())
    h, w, c = img.shape
    L.hflip_u8(img, h, w, c)
    return img
