"""PNG IO helpers (host side, asset load / golden dump time only).

The reference uses zigimg for 16-bit grayscale PNG decode
(``Terrain/Terrain.zig:89-93``); we use PIL. Not performance-relevant
(SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def load_grayscale16(path: str) -> np.ndarray:
    """Load a grayscale PNG as uint16 [H, W]. 8-bit files are widened
    (v * 257) the way PNG readers conventionally scale."""
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
    Image.fromarray(data, mode="I;16").save(path)


def save_rgba8(path: str, rgba: np.ndarray) -> None:
    """Write an RGBA uint8 (or float [0,1]) image."""
    rgba = np.asarray(rgba)
    if rgba.dtype != np.uint8:
        rgba = np.clip(np.rint(rgba * 255.0), 0, 255).astype(np.uint8)
    Image.fromarray(rgba, mode="RGBA").save(path)


def load_rgba8(path: str) -> np.ndarray:
    return np.array(Image.open(path).convert("RGBA"))
