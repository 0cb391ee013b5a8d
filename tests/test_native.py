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


# ---------------------------------------------------------------------------
# native PNG codec (png_codec.cpp) vs PIL — identical pixels both ways
# ---------------------------------------------------------------------------

def test_png_gray16_roundtrip_and_pil_parity():
    import io
    from PIL import Image
    from myrenderer_tpu.utils import png_native as pn
    assert pn.available()
    rng = np.random.default_rng(7)
    g = rng.integers(0, 65536, (37, 53), dtype=np.uint16)
    blob = pn.encode_gray16(g)
    np.testing.assert_array_equal(pn.decode_gray16(blob), g)
    # PIL reads the native bytes identically
    np.testing.assert_array_equal(
        np.array(Image.open(io.BytesIO(blob))).astype(np.uint16), g)
    # native reads PIL bytes identically
    buf = io.BytesIO()
    Image.fromarray(g, mode="I;16").save(buf, format="PNG")
    np.testing.assert_array_equal(pn.decode_gray16(buf.getvalue()), g)


def test_png_gray8_widens_like_pil_path():
    import io
    from PIL import Image
    from myrenderer_tpu.utils import png_native as pn
    assert pn.available()
    rng = np.random.default_rng(8)
    g8 = rng.integers(0, 256, (20, 31), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(g8, mode="L").save(buf, format="PNG")
    np.testing.assert_array_equal(pn.decode_gray16(buf.getvalue()),
                                  g8.astype(np.uint16) * 257)


def test_png_rgba8_roundtrip_and_pil_parity():
    import io
    from PIL import Image
    from myrenderer_tpu.utils import png_native as pn
    assert pn.available()
    rng = np.random.default_rng(9)
    a = rng.integers(0, 256, (25, 41, 4), dtype=np.uint8)
    blob = pn.encode_rgba8(a)
    np.testing.assert_array_equal(pn.decode_rgba8(blob), a)
    np.testing.assert_array_equal(
        np.array(Image.open(io.BytesIO(blob)).convert("RGBA")), a)
    buf = io.BytesIO()
    Image.fromarray(a, mode="RGBA").save(buf, format="PNG")
    np.testing.assert_array_equal(pn.decode_rgba8(buf.getvalue()), a)


def test_png_unsupported_falls_back():
    """Palette PNGs are outside the native codec's scope: the bridge
    returns None and utils.png falls back to PIL (same pixels)."""
    import io
    from PIL import Image
    from myrenderer_tpu.utils import png, png_native as pn
    assert pn.available()
    rng = np.random.default_rng(10)
    a = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    im = Image.fromarray(a, mode="RGB").convert("P")
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    assert pn.decode_rgba8(buf.getvalue()) is None
    import tempfile, os as _os
    with tempfile.TemporaryDirectory() as d:
        p = _os.path.join(d, "pal.png")
        with open(p, "wb") as f:
            f.write(buf.getvalue())
        out = png.load_rgba8(p)
        np.testing.assert_array_equal(
            out, np.array(Image.open(io.BytesIO(buf.getvalue()))
                          .convert("RGBA")))


def test_png_utils_dispatch_native():
    """utils.png write/read pairs stay bit-exact through the native
    codec (the demo's golden harness path)."""
    import tempfile, os as _os
    from myrenderer_tpu.utils import png
    rng = np.random.default_rng(11)
    with tempfile.TemporaryDirectory() as d:
        g = rng.integers(0, 65536, (100, 100), dtype=np.uint16)
        p = _os.path.join(d, "g.png")
        png.save_grayscale16(p, g)
        np.testing.assert_array_equal(png.load_grayscale16(p), g)
        a = rng.random((32, 45, 4)).astype(np.float32)
        q = _os.path.join(d, "a.png")
        png.save_rgba8(q, a)
        expect = np.clip(np.rint(a * 255.0), 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(png.load_rgba8(q), expect)
