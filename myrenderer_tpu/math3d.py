"""Host-side 3D math: 4x4 matrices in the reference's conventions.

Re-implements the capabilities of the reference's ``math.zig`` (lookAt /
perspective / matMult over mach.math, see ``/root/reference/math.zig:9-39``)
plus the mach.math helpers the demo uses (``projection2D``, identity,
mat/vec multiply — call sites ``App/App.zig:89``, ``SceneNode.zig:96-111``).

Conventions (must match the reference for bit-stable output, SURVEY.md §2.5):

* Matrices are ``float32[4, 4]`` built from **row** vectors with the
  translation in the 4th *column* (``math.zig:14-19``).
* Vectors transform as columns: ``v' = M @ v``.
* Composition is ``parent @ child`` (``SceneNode.zig:96``).
* ``perspective`` is left-handed, maps view-space z in [near, far] to
  depth [0, 1] after the w-divide (row 3 = ``(0,0,f/(f-n),-fn/(f-n))``,
  row 4 = ``(0,0,1,0)``, ``math.zig:22-31``), pairing with depth-clear 1.0
  and a ``less`` depth compare (``Surface.zig:125``, ``Pipeline.zig:150-154``).
* ``perspective`` takes ``fovy`` in **radians** and the demo passes ``90``
  — i.e. halftan = tan(45 rad) ≈ 1.61977. We reproduce the formula, not a
  "fixed" degree version, so the demo matches pixel-for-pixel.

This module is pure NumPy: it runs on the host at scene-build / per-frame
update time. Device-side math inside the jitted frame function uses jnp
directly (see ``myrenderer_tpu/ops``).
"""

from __future__ import annotations

import math as _pymath

import numpy as np

__all__ = [
    "identity",
    "look_at",
    "perspective",
    "projection_2d",
    "mat_mult",
    "translate",
    "scale",
    "rotate_y",
    "mul_vec",
    "normalize",
]

_F32 = np.float32


def identity() -> np.ndarray:
    """4x4 identity (``math.Mat.ident``)."""
    return np.eye(4, dtype=_F32)


def normalize(v: np.ndarray) -> np.ndarray:
    """Normalize a vector; zero vectors normalize to zero (mach's
    ``normalize(0.0)`` fallback used at ``math.zig:10-12``)."""
    v = np.asarray(v, dtype=_F32)
    n = np.linalg.norm(v)
    if n == 0.0:
        return np.zeros_like(v)
    return (v / n).astype(_F32)


def _cross3(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """3-vector cross product, expanded by hand: np.cross's generic
    broadcasting machinery costs ~0.2 ms per call on single vectors
    (measured in the round-4 demo host profile — look_at runs twice
    per frame on the hot path). Same f32 arithmetic, same results."""
    return np.array([a[1] * b[2] - a[2] * b[1],
                     a[2] * b[0] - a[0] * b[2],
                     a[0] * b[1] - a[1] * b[0]], dtype=_F32)


def look_at(camera, target, up_ref) -> np.ndarray:
    """View matrix, exactly the construction at ``math.zig:9-20``.

    forward = normalize(target - camera); right = normalize(up x forward);
    up' = normalize(forward x right); rows = (right|-r.c), (up|-u.c),
    (forward|-f.c), (0,0,0,1). Left-handed: camera looks down +z in view
    space.
    """
    camera = np.asarray(camera, dtype=_F32)
    target = np.asarray(target, dtype=_F32)
    up_ref = np.asarray(up_ref, dtype=_F32)

    forward = normalize(target - camera)
    right = normalize(_cross3(up_ref, forward))
    up = normalize(_cross3(forward, right))

    m = np.zeros((4, 4), dtype=_F32)
    m[0, :3] = right
    m[0, 3] = -right.dot(camera)
    m[1, :3] = up
    m[1, 3] = -up.dot(camera)
    m[2, :3] = forward
    m[2, 3] = -forward.dot(camera)
    m[3, 3] = 1.0
    return m


def perspective(fovy: float, aspect: float, near: float, far: float) -> np.ndarray:
    """Perspective projection, exactly ``math.zig:22-31``.

    ``fovy`` is in radians (the demo passes 90 and gets tan(45 rad);
    reproduce, don't fix — SURVEY.md §2.5). Maps z in [near, far] to
    depth [0, 1]; w' = view-space z.
    """
    halftan = _pymath.tan(fovy / 2.0)
    f, n = float(far), float(near)
    m = np.zeros((4, 4), dtype=_F32)
    m[0, 0] = 1.0 / (aspect * halftan)
    m[1, 1] = 1.0 / halftan
    m[2, 2] = f / (f - n)
    m[2, 3] = -f * n / (f - n)
    m[3, 2] = 1.0
    return m


def projection_2d(
    *,
    left: float,
    right: float,
    bottom: float,
    top: float,
    near: float,
    far: float,
) -> np.ndarray:
    """Orthographic projection in WebGPU clip conventions
    (x: [left,right] -> [-1,1], y: [bottom,top] -> [-1,1],
    z: [near,far] -> [0,1], w = 1).

    Mirrors mach.math ``Mat4x4.projection2D`` as used by the demo at
    ``App/App.zig:89`` (left=0, right=200, bottom=200, top=0: classic
    y-down UI space).
    """
    m = np.zeros((4, 4), dtype=_F32)
    m[0, 0] = 2.0 / (right - left)
    m[0, 3] = -(right + left) / (right - left)
    m[1, 1] = 2.0 / (top - bottom)
    m[1, 3] = -(top + bottom) / (top - bottom)
    m[2, 2] = 1.0 / (far - near)
    m[2, 3] = -near / (far - near)
    m[3, 3] = 1.0
    return m


def mat_mult(mats) -> np.ndarray:
    """Left-to-right fold from identity: ``matMult`` at ``math.zig:33-39``."""
    result = identity()
    for m in mats:
        result = (result @ np.asarray(m, dtype=_F32)).astype(_F32)
    return result


def translate(v) -> np.ndarray:
    """Translation matrix (translation in the 4th column)."""
    m = identity()
    m[:3, 3] = np.asarray(v, dtype=_F32)
    return m


def scale(v) -> np.ndarray:
    """Non-uniform scale matrix."""
    m = identity()
    s = np.asarray(v, dtype=_F32)
    m[0, 0], m[1, 1], m[2, 2] = s[0], s[1], s[2]
    return m


def rotate_y(angle: float) -> np.ndarray:
    """Rotation about +Y by ``angle`` radians (left-handed, matches the
    row-vector convention above)."""
    c = _pymath.cos(angle)
    s = _pymath.sin(angle)
    m = identity()
    m[0, 0] = c
    m[0, 2] = s
    m[2, 0] = -s
    m[2, 2] = c
    return m


def mul_vec(m: np.ndarray, v) -> np.ndarray:
    """``Mat.mulVec``: column-vector transform. Accepts length-3 (w=1
    appended) or length-4 vectors; returns length-4."""
    v = np.asarray(v, dtype=_F32)
    if v.shape[-1] == 3:
        v = np.concatenate([v, np.ones(v.shape[:-1] + (1,), dtype=_F32)], axis=-1)
    return (np.asarray(m, dtype=_F32) @ v).astype(_F32)


# Reference-spelling aliases (math.zig / mach.math names).
lookAt = look_at
matMult = mat_mult
projection2D = projection_2d
mulVec = mul_vec
