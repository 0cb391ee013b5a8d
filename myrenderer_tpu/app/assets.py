"""Procedural demo assets.

The reference ships a 100x100 16-bit grayscale heightmap PNG
(``App/HEIGHTMAP.png``, loaded at ``Terrain/Terrain.zig:89-121``). To
keep this repo self-contained (no copied assets) the demo generates an
equivalent heightmap deterministically: seeded multi-octave value noise,
same size and dtype. Pass ``--heightmap path.png`` to the demo to use a
file instead (including the reference's own).
"""

from __future__ import annotations

import numpy as np


def default_heightmap(size: int = 100, seed: int = 12345) -> np.ndarray:
    """Deterministic uint16 [size, size] heightmap: smooth rolling
    terrain from 4 octaves of bilinear value noise."""
    rng = np.random.default_rng(seed)
    acc = np.zeros((size, size), np.float64)
    amp_total = 0.0
    for octave in range(4):
        cells = 3 * (2 ** octave)          # 3, 6, 12, 24 control points
        amp = 0.5 ** octave
        grid = rng.random((cells + 1, cells + 1))
        ys = np.linspace(0, cells, size)
        xs = np.linspace(0, cells, size)
        y0 = np.clip(ys.astype(int), 0, cells - 1)
        x0 = np.clip(xs.astype(int), 0, cells - 1)
        fy = (ys - y0)[:, None]
        fx = (xs - x0)[None, :]
        # smoothstep for C1 continuity
        fy = fy * fy * (3 - 2 * fy)
        fx = fx * fx * (3 - 2 * fx)
        g00 = grid[np.ix_(y0, x0)]
        g01 = grid[np.ix_(y0, x0 + 1)]
        g10 = grid[np.ix_(y0 + 1, x0)]
        g11 = grid[np.ix_(y0 + 1, x0 + 1)]
        acc += amp * ((g00 * (1 - fx) + g01 * fx) * (1 - fy)
                      + (g10 * (1 - fx) + g11 * fx) * fy)
        amp_total += amp
    norm = acc / amp_total
    return np.clip(norm * 65535.0, 0, 65535).astype(np.uint16)
