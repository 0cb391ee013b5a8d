"""ctypes bridge to the native (C++) PNG codec.

Same contract as the triangulator bridge (geometry/native.py): the
library is optional — when ``native/libmyrenderer_native.so`` exists
(``make -C native``), utils/png.py dispatches here; PIL is the
always-available fallback and the cross-check (both must produce
identical pixels, tests/test_native.py). The native codec covers the
framework's actual PNG traffic — grayscale 8/16-bit decode (the
reference's heightmap path, ``Terrain/Terrain.zig:89-93`` via zigimg),
RGBA 8-bit decode (golden loads), grayscale-16/RGBA-8 encode (golden
and asset dumps) — and reports unsupported formats so callers fall
back."""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", "..", "native",
                         "libmyrenderer_native.so")
_lib = None
_checked = False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    try:
        lib.myr_png_dims.restype = ctypes.c_int
    except AttributeError:      # stale .so without the codec
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.myr_png_dims.argtypes = [u8p, ctypes.c_long, ip, ip, ip, ip]
    lib.myr_png_decode_gray16.restype = ctypes.c_int
    lib.myr_png_decode_gray16.argtypes = [u8p, ctypes.c_long, u16p]
    lib.myr_png_decode_rgba8.restype = ctypes.c_int
    lib.myr_png_decode_rgba8.argtypes = [u8p, ctypes.c_long, u8p]
    lib.myr_png_encode_rgba8.restype = ctypes.c_long
    lib.myr_png_encode_rgba8.argtypes = [u8p, ctypes.c_int,
                                         ctypes.c_int, u8p,
                                         ctypes.c_long]
    lib.myr_png_encode_gray16.restype = ctypes.c_long
    lib.myr_png_encode_gray16.argtypes = [u16p, ctypes.c_int,
                                          ctypes.c_int, u8p,
                                          ctypes.c_long]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _buf(data: bytes):
    arr = np.frombuffer(data, np.uint8)
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data)


def decode_gray16(data: bytes) -> Optional[np.ndarray]:
    """uint16 [H, W], or None when the file needs the PIL fallback."""
    lib = load()
    if lib is None:
        return None
    p, n = _buf(data)
    w = ctypes.c_int()
    h = ctypes.c_int()
    bd = ctypes.c_int()
    ct = ctypes.c_int()
    if lib.myr_png_dims(p, n, ctypes.byref(w), ctypes.byref(h),
                        ctypes.byref(bd), ctypes.byref(ct)) or \
            ct.value != 0:
        return None
    out = np.empty((h.value, w.value), np.uint16)
    if lib.myr_png_decode_gray16(
            p, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))):
        return None
    return out


def decode_rgba8(data: bytes) -> Optional[np.ndarray]:
    """uint8 [H, W, 4], or None when the file needs the PIL fallback."""
    lib = load()
    if lib is None:
        return None
    p, n = _buf(data)
    w = ctypes.c_int()
    h = ctypes.c_int()
    bd = ctypes.c_int()
    ct = ctypes.c_int()
    if lib.myr_png_dims(p, n, ctypes.byref(w), ctypes.byref(h),
                        ctypes.byref(bd), ctypes.byref(ct)) or \
            ct.value != 6:
        return None
    out = np.empty((h.value, w.value, 4), np.uint8)
    if lib.myr_png_decode_rgba8(
            p, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))):
        return None
    return out


def _run_encode(fn, pixels, w: int, h: int) -> Optional[bytes]:
    cap = pixels.nbytes + 4096
    out = np.empty(cap, np.uint8)
    outp = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    n = fn(pixels, w, h, outp, cap)
    if n < 0:                   # grew past the estimate: retry exact
        cap = -n
        out = np.empty(cap, np.uint8)
        outp = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        n = fn(pixels, w, h, outp, cap)
    if n <= 0:
        return None
    return out[:n].tobytes()


def encode_rgba8(rgba: np.ndarray) -> Optional[bytes]:
    lib = load()
    if lib is None:
        return None
    rgba = np.ascontiguousarray(rgba, np.uint8)
    h, w = rgba.shape[:2]
    return _run_encode(
        lambda px, w_, h_, o, c: lib.myr_png_encode_rgba8(
            px.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            w_, h_, o, c),
        rgba, w, h)


def encode_gray16(gray: np.ndarray) -> Optional[bytes]:
    lib = load()
    if lib is None:
        return None
    gray = np.ascontiguousarray(gray, np.uint16)
    h, w = gray.shape
    return _run_encode(
        lambda px, w_, h_, o, c: lib.myr_png_encode_gray16(
            px.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            w_, h_, o, c),
        gray, w, h)
