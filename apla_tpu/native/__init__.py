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
_build_failed = False


def _build() -> bool:
    global _build_failed
    if _build_failed:
        # cache the failure like the jpeg path does — retrying would run a
        # (up to 120 s) g++ subprocess under _lock on EVERY call
        return False
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        _build_failed = True
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


# --------------------------------------------------------------------------- #
# native JPEG decode (jpeg_dec.cpp, links system libjpeg): decode at the
# nearest DCT scale then bilinear to the exact target — the raw_mode /
# device-augment pipeline decodes a 2048px photo to 256px doing ~2% of the
# full IDCT work, GIL-free in loader threads.  Falls back to PIL if libjpeg
# or a compiler is unavailable.
# --------------------------------------------------------------------------- #

_JPEG_SRC = os.path.join(_HERE, "jpeg_dec.cpp")
_JPEG_SO = os.path.join(_HERE, "libjpeg_dec.so")
_jpeg_lib = None
_jpeg_tried = False


def _load_jpeg():
    global _jpeg_lib, _jpeg_tried
    with _lock:
        if _jpeg_lib is not None or _jpeg_tried:
            return _jpeg_lib
        _jpeg_tried = True
        try:
            if not (os.path.exists(_JPEG_SO) and
                    os.path.getmtime(_JPEG_SO) >=
                    os.path.getmtime(_JPEG_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _JPEG_SRC,
                     "-o", _JPEG_SO, "-ljpeg"],
                    check=True, capture_output=True, timeout=120)
            L = ctypes.CDLL(_JPEG_SO)
            u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
            ip = ctypes.POINTER(ctypes.c_int)
            L.jpeg_decode_resize.argtypes = [
                u8p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
                u8p, ctypes.c_long, ip, ip]
            L.jpeg_decode_resize.restype = ctypes.c_int
            _jpeg_lib = L
        except Exception:
            _jpeg_lib = None
        return _jpeg_lib


def jpeg_available() -> bool:
    return _load_jpeg() is not None


def decode_jpeg(data: bytes, out_size: int | None = None) -> "np.ndarray | None":
    """Decode a JPEG byte string to RGB uint8 HWC; `out_size` resizes to
    [out_size, out_size, 3] (DCT-scaled decode + bilinear).  Returns None
    on decode failure (caller falls back to PIL)."""
    L = _load_jpeg()
    if L is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    if out_size:
        out = np.empty((out_size, out_size, 3), np.uint8)
        oh, ow = ctypes.c_int(), ctypes.c_int()
        rc = L.jpeg_decode_resize(buf, buf.size, out_size, out_size,
                                  out, out.size, ctypes.byref(oh),
                                  ctypes.byref(ow))
        return out if rc == 0 else None
    # full-size: decode header first via a generous buffer is wasteful;
    # probe dims by decoding into a resizable path: use PIL-free two-pass
    oh, ow = ctypes.c_int(), ctypes.c_int()
    # pass a tiny target query: decode at full size into a max buffer
    # (16Mpx cap)
    cap = 16_000_000 * 3
    out = np.empty((cap,), np.uint8)
    rc = L.jpeg_decode_resize(buf, buf.size, 0, 0, out, out.size,
                              ctypes.byref(oh), ctypes.byref(ow))
    if rc != 0:
        return None
    return out[:oh.value * ow.value * 3].reshape(oh.value, ow.value, 3).copy()
