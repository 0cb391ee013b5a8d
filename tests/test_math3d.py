"""Unit tests for myrenderer_tpu.math3d against the reference formulas
(``/root/reference/math.zig:9-39``) and known-good matrices."""

import math

import numpy as np
import pytest

from myrenderer_tpu import math3d as m3


def test_identity():
    np.testing.assert_array_equal(m3.identity(), np.eye(4, dtype=np.float32))


def test_look_at_matches_reference_construction():
    cam = np.array([10.0, 6.0, 0.0], np.float32)
    tgt = np.zeros(3, np.float32)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    m = m3.look_at(cam, tgt, up)

    fwd = (tgt - cam) / np.linalg.norm(tgt - cam)
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    up2 /= np.linalg.norm(up2)

    np.testing.assert_allclose(m[0, :3], right, rtol=1e-6)
    np.testing.assert_allclose(m[1, :3], up2, rtol=1e-6)
    np.testing.assert_allclose(m[2, :3], fwd, rtol=1e-6)
    np.testing.assert_allclose(m[3], [0, 0, 0, 1], rtol=0)
    # Camera position maps to view-space origin.
    np.testing.assert_allclose(m3.mul_vec(m, cam)[:3], 0.0, atol=1e-5)
    # Target sits on the +z view axis (left-handed look-at).
    v = m3.mul_vec(m, tgt)
    assert v[2] > 0
    np.testing.assert_allclose(v[:2], 0.0, atol=1e-5)


def test_look_at_orthonormal():
    m = m3.look_at([3.0, -2.0, 7.0], [1.0, 1.0, 1.0], [0.0, 1.0, 0.0])
    r = m[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


def test_perspective_formula():
    """Row-for-row against math.zig:22-31, including the radians quirk
    (demo passes fovy=90 *radians*, SURVEY.md §2.5)."""
    fovy, aspect, near, far = 90.0, 1.0, 0.1, 200.0
    m = m3.perspective(fovy, aspect, near, far)
    halftan = math.tan(fovy / 2.0)
    assert m[0, 0] == pytest.approx(1.0 / (aspect * halftan))
    assert m[1, 1] == pytest.approx(1.0 / halftan)
    assert m[2, 2] == pytest.approx(far / (far - near))
    assert m[2, 3] == pytest.approx(-far * near / (far - near))
    assert m[3, 2] == 1.0
    assert m[3, 3] == 0.0


def test_perspective_depth_range():
    """near -> depth 0, far -> depth 1 after w-divide (pairs with depth
    clear 1.0 + 'less' compare, Surface.zig:125 / Pipeline.zig:150-154)."""
    m = m3.perspective(1.2, 1.5, 0.5, 100.0)
    for z, expect in [(0.5, 0.0), (100.0, 1.0)]:
        v = m3.mul_vec(m, [0.0, 0.0, z])
        assert v[3] == pytest.approx(z)  # w' = view z
        assert v[2] / v[3] == pytest.approx(expect, abs=1e-6)


def test_projection_2d_demo_bounds():
    """The App.zig:89 ortho: left=0,right=200,bottom=200,top=0 (y-down UI
    space) with near=0.1, far=200."""
    m = m3.projection_2d(left=0.0, right=200.0, bottom=200.0, top=0.0,
                         near=0.1, far=200.0)
    # Corners map to NDC corners; top of UI space maps to +1 (NDC up).
    np.testing.assert_allclose(m3.mul_vec(m, [0.0, 0.0, 0.1]),
                               [-1.0, 1.0, 0.0, 1.0], atol=1e-6)
    v = m3.mul_vec(m, [200.0, 200.0, 200.0])
    np.testing.assert_allclose(v, [1.0, -1.0, 1.0, 1.0], atol=1e-6)
    # The polygon plane z=1 (Polygon.zig:36) lands inside [0, 1].
    z = m3.mul_vec(m, [50.0, 50.0, 1.0])[2]
    assert 0.0 < z < 1.0


def test_mat_mult_fold():
    a = m3.translate([1.0, 2.0, 3.0])
    b = m3.scale([2.0, 2.0, 2.0])
    np.testing.assert_allclose(m3.mat_mult([a, b]), a @ b, atol=1e-6)
    np.testing.assert_allclose(m3.mat_mult([]), np.eye(4), atol=0)


def test_mul_vec_appends_w():
    t = m3.translate([5.0, 0.0, 0.0])
    np.testing.assert_allclose(m3.mul_vec(t, [1.0, 1.0, 1.0]),
                               [6.0, 1.0, 1.0, 1.0])
