"""PNG IO helpers (host side, asset load / golden dump time only).

The reference uses zigimg for 16-bit grayscale PNG decode
(``Terrain/Terrain.zig:89-93``); here the native C++ codec
(``native/png_codec.cpp``, ``make -C native``) handles the framework's
actual PNG traffic — grayscale 8/16 decode, RGBA-8 decode, gray-16 /
RGBA-8 encode — with PIL as the always-available fallback and
correctness cross-check (tests/test_native.py asserts identical
pixels both ways). Not performance-relevant (SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np

from . import png_native


def load_grayscale16(path: str) -> np.ndarray:
    """Load a grayscale PNG as uint16 [H, W]. 8-bit files are widened
    (v * 257) the way PNG readers conventionally scale."""
    with open(path, "rb") as f:
        data = f.read()
    arr = png_native.decode_gray16(data)
    if arr is not None:
        return arr
    from PIL import Image
    img = Image.open(path)
    arr = np.array(img)
    if arr.ndim == 3:
        arr = arr[..., 0]
    if arr.dtype == np.uint8:
        arr = arr.astype(np.uint16) * 257
    elif arr.dtype in (np.int32, np.uint32, np.int64):
        arr = arr.astype(np.uint16)
    elif arr.dtype != np.uint16:
        raise ValueError(f"unsupported PNG dtype {arr.dtype}")
    return arr


def save_grayscale16(path: str, data: np.ndarray) -> None:
    data = np.asarray(data, np.uint16)
    blob = png_native.encode_gray16(data)
    if blob is not None:
        with open(path, "wb") as f:
            f.write(blob)
        return
    from PIL import Image
    Image.fromarray(data, mode="I;16").save(path)


def save_rgba8(path: str, rgba: np.ndarray) -> None:
    """Write an RGBA uint8 (or float [0,1]) image."""
    rgba = np.asarray(rgba)
    if rgba.dtype != np.uint8:
        rgba = np.clip(np.rint(rgba * 255.0), 0, 255).astype(np.uint8)
    blob = png_native.encode_rgba8(rgba)
    if blob is not None:
        with open(path, "wb") as f:
            f.write(blob)
        return
    from PIL import Image
    Image.fromarray(rgba, mode="RGBA").save(path)


def load_rgba8(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    arr = png_native.decode_rgba8(data)
    if arr is not None:
        return arr
    from PIL import Image
    return np.array(Image.open(path).convert("RGBA"))
