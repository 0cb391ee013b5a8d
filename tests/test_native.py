"""Native (C++) triangulator vs the Python implementation: identical
triangles in identical emit order, for the same seeded edge order."""

import subprocess
import sys

import numpy as np
import pytest

from myrenderer_tpu.geometry import Triangulation, native, unirand_seed
from myrenderer_tpu.geometry.native import triangulate_native

from test_triangulation import HEPTAGON, SQUARE, random_simple_polygons


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        # try to build once; skip module if no toolchain
        try:
            subprocess.run(["make", "-C", "native"], check=True,
                           capture_output=True, cwd=".")
        except Exception:
            pytest.skip("native toolchain unavailable")
        native._checked = False
        native._lib = None
        if not native.available():
            pytest.skip("native library failed to build")


def python_verts(poly, seed=0):
    out = []
    Triangulation(seed, use_native=False).create_polygon(poly, out.append)
    return np.asarray(out, np.float32)


def native_verts(poly, seed=0):
    n = len(poly)
    order = list(unirand_seed(n, seed))
    return triangulate_native(np.asarray(poly, np.float32), order)


@pytest.mark.parametrize("poly", [SQUARE, HEPTAGON])
def test_demo_polygons_identical(poly):
    np.testing.assert_array_equal(python_verts(poly), native_verts(poly))


def test_random_polygons_identical():
    for poly in random_simple_polygons(40, seed=123):
        for seed in (0, 1, 7):
            np.testing.assert_array_equal(python_verts(poly, seed),
                                          native_verts(poly, seed),
                                          err_msg=f"seed={seed}")


def test_dispatch_through_triangulation_class():
    out_native, out_python = [], []
    Triangulation(0, use_native=True).create_polygon(
        HEPTAGON, out_native.append)
    Triangulation(0, use_native=False).create_polygon(
        HEPTAGON, out_python.append)
    np.testing.assert_array_equal(np.asarray(out_native),
                                  np.asarray(out_python))


def test_native_rejects_ccw():
    with pytest.raises(ValueError):
        native_verts(SQUARE[::-1])
