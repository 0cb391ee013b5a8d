"""ctypes bridge to the native (C++) triangulator core.

The native library is optional: if ``native/libmyrenderer_native.so``
exists (``make -C native``), ``Triangulation`` dispatches to it; the
Python implementation is the always-available fallback and the
correctness reference. Both take the same edge-insertion order and must
produce identical output (tested in test_native.py).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", "..", "native", "libmyrenderer_native.so")
_lib = None
_checked = False


def load() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None when not built."""
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.myr_triangulate.restype = ctypes.c_int
    lib.myr_triangulate.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def triangulate_native(points: Sequence, edge_order: Sequence[int]
                       ) -> np.ndarray:
    """Run the native core. Returns f32[(n-2)*3, 2] emitted vertices.
    Raises if the library is missing or the input is invalid."""
    lib = load()
    if lib is None:
        raise RuntimeError("native triangulator not built "
                           "(run: make -C native)")
    pts = np.ascontiguousarray(points, np.float32)
    n = pts.shape[0]
    order = np.ascontiguousarray(edge_order, np.int32)
    cap = max((n - 2) * 6, 6)
    out = np.empty(cap, np.float32)
    rc = lib.myr_triangulate(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap)
    if rc < 0:
        raise ValueError(f"native triangulation failed (code {rc}): "
                         "expected a simple clockwise polygon")
    return out[:rc].reshape(-1, 2)
