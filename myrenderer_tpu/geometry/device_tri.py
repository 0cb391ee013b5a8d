"""Device-side polygon triangulation (jitted, fixed capacity).

Closes the BASELINE.json:5 north-star clause "Polygon ear-clip
Triangulation ... vectorized on device": a mask-based ear clipper that
runs entirely under ``jax.jit`` (and ``vmap``, for batches of polygons)
with static shapes, for the demo-scale polygons the reference feeds
Seidel's algorithm (``Polygon/Polygon.zig:81-107``: n = 7 and n = 4;
capacity here is any static ``N``).

Shape: an O(n^3) ear clip — per clip step, the convexity and
emptiness tests for ALL candidate ears run as one vectorized [N] /
[N, N] pass (full VPU lanes), and the n - 2 clip steps are a
``lax.fori_loop`` with a linked-list state in small index vectors.
That is the right trade at polygon scale: the host Seidel path
(``triangulation.py``, O(n log n) expected) wins asymptotically but is
pointer-chasing and data-dependent — the wrong shape for a TPU — while
n <= 32 polygons cost microseconds either way and the device path
keeps scene construction on-chip.

Contract (same as the host path, ``Triangulation.zig:442-445``):
vertices clockwise in y-down screen coordinates, implicit closing
edge, no self-intersection; a simple n-gon yields exactly n - 2
triangles. The TRIANGLE SET generally differs from Seidel's (any
simple polygon admits many triangulations); what is invariant — and
what ``tests/test_device_tri.py`` asserts against the host path — is
the count, the summed signed area, per-triangle winding, and the
RASTERIZED COVERAGE (the top-left fill rule makes any valid
triangulation of the same polygon cover exactly the same pixel set).

Degenerate robustness: with collinear vertices there may be no
strictly-convex empty ear; the clip then accepts the best non-reflex
ear (zero-area triangles rasterize to nothing), matching the host
path's tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _cross(ax, ay, bx, by, cx, cy):
    """2D cross of (b - a) x (c - a); CW (y-down) turns are positive
    with the same orientation convention as the host path's
    ``_is_left_of`` (``triangulation.py:99``)."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


@functools.partial(jax.jit, static_argnums=(2,))
def triangulate_indices(points: jax.Array, n: jax.Array,
                        capacity: int = 32) -> jax.Array:
    """Ear-clip a clockwise simple polygon on device.

    points: f32[N, 2] vertex coordinates (N == ``capacity``; slots at
    index >= ``n`` are padding and ignored). n: i32[] live vertex
    count (2 < n <= N). Returns i32[N - 2, 3] triangle vertex indices
    (original polygon indices, clockwise); rows at index >= n - 2 are
    (0, 0, 0) padding — degenerate, rasterize to nothing.
    """
    N = capacity
    px = points[:, 0]
    py = points[:, 1]
    idx = jnp.arange(N, dtype=jnp.int32)

    # circular linked list over the first n slots
    nxt0 = jnp.where(idx + 1 >= n, 0, idx + 1)
    prv0 = jnp.where(idx == 0, n - 1, idx - 1)
    alive0 = idx < n
    out0 = jnp.zeros((N - 2, 3), jnp.int32)

    def clip_step(k, state):
        nxt, prv, alive, out = state
        a, b, c = prv, idx, nxt                       # candidate ears
        cr = _cross(px[a], py[a], px[b], py[b], px[c], py[c])  # [N]
        convex = cr >= 0.0     # CW turn (or collinear) in y-down space

        # emptiness: no OTHER alive vertex strictly inside ear i.
        # [N, N] broadcast: row = ear i, col = tested vertex j.
        jx, jy = px[None, :], py[None, :]
        d0 = _cross(px[a][:, None], py[a][:, None],
                    px[b][:, None], py[b][:, None], jx, jy)
        d1 = _cross(px[b][:, None], py[b][:, None],
                    px[c][:, None], py[c][:, None], jx, jy)
        d2 = _cross(px[c][:, None], py[c][:, None],
                    px[a][:, None], py[a][:, None], jx, jy)
        inside = (d0 > 0) & (d1 > 0) & (d2 > 0)       # strict interior
        other = (alive[None, :] & (idx[None, :] != a[:, None])
                 & (idx[None, :] != b[:, None])
                 & (idx[None, :] != c[:, None]))
        empty = jnp.logical_not((inside & other).any(axis=1))

        # prefer strictly-convex empty ears; fall back to collinear
        # ones (zero-area) so degenerate inputs cannot deadlock
        strict = alive & (cr > 0.0) & empty
        loose = alive & convex & empty
        cand = jnp.where(strict.any(), strict, loose)
        # lowest-index ear: deterministic, order-independent of the
        # (associative) vector reductions above
        ear = jnp.argmax(cand)                        # first True
        ea, eb, ec = prv[ear], ear, nxt[ear]

        out = lax.dynamic_update_slice(
            out, jnp.stack([ea, eb, ec])[None].astype(jnp.int32),
            (k, jnp.int32(0)))
        # unlink eb
        nxt = nxt.at[ea].set(ec)
        prv = prv.at[ec].set(ea)
        alive = alive.at[eb].set(False)
        return nxt, prv, alive, out

    def guarded(k, state):
        # clip exactly n - 2 ears; later iterations are no-ops for
        # small polygons (static trip count N - 2)
        return lax.cond(k < n - 2, lambda s: clip_step(k, s),
                        lambda s: s, state)

    _, _, _, out = lax.fori_loop(0, N - 2, guarded,
                                 (nxt0, prv0, alive0, out0))
    return out


def triangulate_device(points, capacity: int = 32):
    """Host-friendly wrapper: list of (x, y) -> list of triangle point
    triples (same output convention as ``triangulation.triangulate``,
    flattened points in CW emit order)."""
    import numpy as np

    pts = np.asarray(points, np.float32)
    n = pts.shape[0]
    if n < 3:
        raise ValueError("polygon needs at least 3 points")
    if n > capacity:
        raise ValueError(f"polygon has {n} points > capacity {capacity}")
    buf = np.zeros((capacity, 2), np.float32)
    buf[:n] = pts
    tris = np.asarray(triangulate_indices(jnp.asarray(buf),
                                          jnp.int32(n), capacity))
    return [tuple(pts[i]) for t in tris[:n - 2] for i in t]
