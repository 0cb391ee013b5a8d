"""Device-side (jitted) ear-clip triangulation vs the host Seidel path
(BASELINE.json:5 "Triangulation ... vectorized on device"; VERDICT r3
lever 7).

The two algorithms produce different (both valid) triangulations of
the same polygon, so the assertions are the triangulation invariants:
triangle count n - 2, summed signed area == polygon area, per-triangle
clockwise winding — plus the strongest one: the RASTERIZED COVERAGE of
the two triangle sets is pixel-identical (the top-left fill rule
covers any valid triangulation of a polygon exactly once per interior
pixel, so coverage is a triangulation-independent function of the
polygon)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myrenderer_tpu.geometry import triangulate
from myrenderer_tpu.geometry.device_tri import (triangulate_device,
                                                triangulate_indices)
from myrenderer_tpu.ops import raster_common as rc
from myrenderer_tpu.ops import raster_ref as rr

HEPTAGON = [  # the demo's concave heptagon (App.zig:68-76)
    (62.742857, 106.97143), (93.085712, 65.828571),
    (147.08571, 85.628572), (122.14285, 144.77143),
    (102.34286, 93.857142), (79.199998, 130.37143),
    (81.00000, 105.17143),
]
SQUARE = [(10.0, 10.0), (40.0, 10.0), (40.0, 40.0), (10.0, 40.0)]


def signed_area_cw(pts):
    """Positive for clockwise rings in y-down coordinates."""
    p = np.asarray(pts, np.float64)
    x, y = p[:, 0], p[:, 1]
    return 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)


def star_polygon(n, seed):
    """Random star-shaped polygon (simple by construction), CW in
    y-down coordinates."""
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(20.0, 60.0, n)
    x = 64.0 + rad * np.cos(ang)
    y = 64.0 + rad * np.sin(ang)   # increasing angle = CW when y is down
    return list(zip(x.astype(np.float32), y.astype(np.float32)))


def coverage(tri_points, H=160, W=160):
    """Rasterize a flat CW triangle list (z = 1 plane like the Polygon
    module) and return the boolean coverage mask."""
    p = np.asarray(tri_points, np.float32).reshape(-1, 3, 2)
    T = p.shape[0]
    # orthographic lift into clip space covering [0, W] x [0, H]
    x = p[..., 0] / W * 2.0 - 1.0
    y = 1.0 - p[..., 1] / H * 2.0
    clip = np.stack([x, y, np.full_like(x, 0.5), np.ones_like(x)], -1)
    vary = np.ones((T, 3, 4), np.float32)
    tc = rc.triangle_setup(jnp.asarray(clip), jnp.asarray(vary),
                           jnp.ones(T, bool), W, H, "back")
    _d, winner = jax.jit(rr.rasterize_visibility,
                         static_argnums=(1, 2))(tc, H, W)
    return np.asarray(winner) >= 0


POLYGONS = [("heptagon", HEPTAGON), ("square", SQUARE)] + [
    (f"star{n}_{s}", star_polygon(n, s))
    for n, s in [(3, 0), (5, 1), (8, 2), (13, 3), (21, 4), (32, 5)]]


@pytest.mark.parametrize("name,poly", POLYGONS,
                         ids=[n for n, _ in POLYGONS])
def test_device_matches_host_invariants(name, poly):
    n = len(poly)
    host = triangulate(poly)
    dev = triangulate_device(poly)
    assert len(dev) == 3 * (n - 2) == len(host)

    # per-triangle CW winding and no NaN emit
    dev_tris = np.asarray(dev, np.float64).reshape(-1, 3, 2)
    areas = np.array([signed_area_cw(t) for t in dev_tris])
    assert (areas >= -1e-6).all(), "device emitted a CCW triangle"

    # summed area equals the polygon area (both triangulations tile it)
    poly_area = signed_area_cw(poly)
    assert np.isclose(areas.sum(), poly_area, rtol=1e-4)
    host_tris = np.asarray(host, np.float64).reshape(-1, 3, 2)
    host_area = sum(signed_area_cw(t) for t in host_tris)
    assert np.isclose(areas.sum(), host_area, rtol=1e-4)

    # the decisive check: identical rasterized coverage
    np.testing.assert_array_equal(coverage(dev), coverage(host))


def test_batched_vmap_triangulation():
    """A batch of polygons triangulates in ONE vmapped device call —
    the 'vectorized on device' form of the north-star clause."""
    cap = 32
    polys = [HEPTAGON, SQUARE, star_polygon(11, 7), star_polygon(32, 8)]
    pts = np.zeros((len(polys), cap, 2), np.float32)
    ns = np.zeros(len(polys), np.int32)
    for i, p in enumerate(polys):
        pts[i, :len(p)] = p
        ns[i] = len(p)
    batched = jax.jit(jax.vmap(
        lambda p, n: triangulate_indices(p, n, cap)))
    tris = np.asarray(batched(jnp.asarray(pts), jnp.asarray(ns)))
    assert tris.shape == (len(polys), cap - 2, 3)
    for i, poly in enumerate(polys):
        n = len(poly)
        flat = [tuple(pts[i, j]) for t in tris[i, :n - 2] for j in t]
        seq = triangulate_device(poly)
        assert flat == seq, "vmapped output differs from single-call"


def test_rejects_bad_inputs():
    with pytest.raises(ValueError, match="at least 3"):
        triangulate_device([(0, 0), (1, 1)])
    with pytest.raises(ValueError, match="capacity"):
        triangulate_device(star_polygon(33, 0), capacity=32)


def test_polygon_module_device_triangulation_end_to_end():
    """Polygon(device_triangulation=True) renders the demo polygons
    with the same coverage as the host-Seidel default (palette
    diagonals may differ — coverage may not)."""
    from myrenderer_tpu.renderer import Core, Renderer
    from myrenderer_tpu.content.polygon import Polygon

    def build(device):
        core = Core()
        win = core.create_window(64, 64, "t")
        rend = Renderer(core, raster_backend="oracle")
        rend.adopt_window(win)
        mod = Polygon(rend, device_triangulation=device)
        h = mod.create_polygon(HEPTAGON)
        verts = np.asarray(h.vertex_buffer.map())
        return verts

    v_host = build(False)
    v_dev = build(True)
    assert v_host.shape == v_dev.shape == (15, 5)
    cov_h = coverage(v_host[:, :2])
    cov_d = coverage(v_dev[:, :2])
    np.testing.assert_array_equal(cov_h, cov_d)
