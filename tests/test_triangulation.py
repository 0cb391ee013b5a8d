"""Property tests for the Seidel triangulator.

The reference has no tests (SURVEY.md §4); the properties here are the
ones implied by its contract (``Triangulation.zig:442-445, 563-569``):
n-2 triangles for a simple polygon, exact area preservation, clockwise
winding of every emitted triangle, and disjoint coverage of the interior.
"""

import numpy as np
import pytest

from myrenderer_tpu.geometry import Triangulation, triangulate, unirand_seed

# demo polygons from App/App.zig:68-83
HEPTAGON = [
    (62.742857, 106.97143), (93.085712, 65.828571), (147.08571, 85.628572),
    (122.14285, 144.77143), (102.34286, 93.857142), (79.199998, 130.37143),
    (81.00000, 105.17143),
]
SQUARE = [(10.0, 10.0), (40.0, 10.0), (40.0, 40.0), (10.0, 40.0)]


def shoelace(pts):
    s = 0.0
    n = len(pts)
    for i in range(n):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s / 2.0


def is_simple(pts):
    def crosses(p1, p2, p3, p4):
        def cr(o, a, b):
            return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])
        d1, d2 = cr(p3, p4, p1), cr(p3, p4, p2)
        d3, d4 = cr(p1, p2, p3), cr(p1, p2, p4)
        return ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0))

    n = len(pts)
    for i in range(n):
        for j in range(i + 1, n):
            if j == i + 1 or (i == 0 and j == n - 1):
                continue
            if crosses(pts[i], pts[(i + 1) % n], pts[j], pts[(j + 1) % n]):
                return False
    return True


def random_simple_polygons(count, seed=7):
    """Star polygons around a center: vertices at sorted angles are simple
    as long as every angular gap (incl. the closing one) stays < pi."""
    rng = np.random.default_rng(seed)
    out = []
    while len(out) < count:
        n = int(rng.integers(3, 32))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        gaps = np.diff(np.concatenate([ang, [ang[0] + 2 * np.pi]]))
        if np.min(gaps) < 1e-3 or np.max(gaps) >= np.pi:
            continue
        rad = rng.uniform(0.15, 1.0, n)
        pts = [(float(np.cos(a) * r * 100 + 200), float(np.sin(a) * r * 100 + 200))
               for a, r in zip(ang, rad)]
        if shoelace(pts) < 0:
            pts = pts[::-1]
        if not is_simple(pts):
            continue
        out.append(pts)
    return out


def check_triangulation(poly, seed=0):
    verts = triangulate(poly, seed=seed)
    tris = [verts[i:i + 3] for i in range(0, len(verts), 3)]
    assert len(tris) == len(poly) - 2, "n-2 triangle count"
    total = sum(abs(shoelace(t)) for t in tris)
    poly_area = abs(shoelace(poly))
    assert total == pytest.approx(poly_area, rel=1e-4), "area preserved"
    for t in tris:
        assert shoelace(t) >= 0, f"CW winding violated: {t}"
    return tris


def test_square():
    tris = check_triangulation(SQUARE)
    assert len(tris) == 2


def test_demo_heptagon():
    check_triangulation(HEPTAGON)


def test_demo_heptagon_all_seeds_same_area():
    areas = set()
    for seed in range(8):
        tris = check_triangulation(HEPTAGON, seed=seed)
        areas.add(round(sum(abs(shoelace(t)) for t in tris), 3))
    assert len(areas) == 1  # same polygon area regardless of insertion order


def test_triangle_passthrough():
    tri = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]
    if shoelace(tri) < 0:
        tri = tri[::-1]
    tris = check_triangulation(tri)
    assert len(tris) == 1


def test_concave_l_shape():
    # L-shape, CW in y-down coordinates
    poly = [(0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0), (2.0, 4.0), (0.0, 4.0)]
    assert shoelace(poly) > 0
    check_triangulation(poly)


def test_random_polygons_properties():
    for poly in random_simple_polygons(60):
        for seed in (0, 1):
            check_triangulation(poly, seed=seed)


def test_interior_coverage_exact():
    """Sampled interior points are covered by exactly one triangle
    (no gaps, no overlaps); exterior points by none."""
    rng = np.random.default_rng(3)
    for poly in random_simple_polygons(10, seed=11):
        verts = triangulate(poly)
        tris = np.array(verts, np.float64).reshape(-1, 3, 2)

        def point_in_poly(x, y):
            inside = False
            n = len(poly)
            for i in range(n):
                x1, y1 = poly[i]
                x2, y2 = poly[(i + 1) % n]
                if (y1 > y) != (y2 > y):
                    xi = x1 + (y - y1) / (y2 - y1) * (x2 - x1)
                    if xi > x:
                        inside = not inside
            return inside

        def tri_cover_count(x, y):
            cnt = 0
            for a, b, c in tris:
                d1 = (x - a[0]) * (b[1] - a[1]) - (y - a[1]) * (b[0] - a[0])
                d2 = (x - b[0]) * (c[1] - b[1]) - (y - b[1]) * (c[0] - b[0])
                d3 = (x - c[0]) * (a[1] - c[1]) - (y - c[1]) * (a[0] - c[0])
                if (d1 > 0) == (d2 > 0) == (d3 > 0):
                    cnt += 1
            return cnt

        # margin: skip samples near any polygon or triangle edge
        def near_edge(x, y, eps=0.35):
            edges = [(poly[i], poly[(i + 1) % len(poly)]) for i in range(len(poly))]
            for t in tris:
                edges += [(t[0], t[1]), (t[1], t[2]), (t[2], t[0])]
            p = np.array([x, y])
            for a, b in edges:
                a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
                ab = b - a
                L2 = ab.dot(ab)
                f = 0.0 if L2 == 0 else np.clip((p - a).dot(ab) / L2, 0, 1)
                if np.linalg.norm(a + f * ab - p) < eps:
                    return True
            return False

        xs = rng.uniform(90, 310, 120)
        ys = rng.uniform(90, 310, 120)
        for x, y in zip(xs, ys):
            if near_edge(x, y):
                continue
            expect = 1 if point_in_poly(x, y) else 0
            assert tri_cover_count(x, y) == expect, (x, y, poly)


def test_rejects_degenerate():
    with pytest.raises(ValueError):
        triangulate([(0.0, 0.0), (1.0, 1.0)])


def test_unirand_is_permutation():
    for top in (1, 2, 3, 7, 16, 100, 101):
        for seed in (0, 1, 42):
            seen = list(unirand_seed(top, seed))
            assert sorted(seen) == list(range(top)), (top, seed)


def test_unirand_deterministic():
    assert list(unirand_seed(17, 5)) == list(unirand_seed(17, 5))


def test_reusable_triangulator():
    t = Triangulation(0)
    out1, out2 = [], []
    t.create_polygon(SQUARE, out1.append)
    t.create_polygon(HEPTAGON, out2.append)
    assert len(out1) == 6 and len(out2) == 15
