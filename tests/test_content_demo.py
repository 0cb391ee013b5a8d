"""Tests for content modules (Terrain, Polygon) and the App.zig demo
scene (BASELINE configs 1 and 3)."""

import numpy as np
import pytest

from myrenderer_tpu import math3d
from myrenderer_tpu.app.assets import default_heightmap
from myrenderer_tpu.app.demo import CLEAR_COLOR, POLYGON1, POLYGON2, DemoApp
from myrenderer_tpu.content import Polygon, Terrain
from myrenderer_tpu.content.polygon import PALETTE
from myrenderer_tpu.renderer import Core, Draw, Renderer, Surface

from test_render_e2e import make_renderer, render_frame


def test_default_heightmap_properties():
    hm = default_heightmap()
    assert hm.shape == (100, 100) and hm.dtype == np.uint16
    assert hm.min() >= 0 and hm.max() <= 65535
    assert np.array_equal(hm, default_heightmap())  # deterministic
    # non-trivial relief
    assert hm.std() > 2000


def test_terrain_node_structure():
    rend, _ = make_renderer()
    terr = Terrain(rend)
    node = terr.create_terrain(default_heightmap(16))
    inst = node.get_backing()
    assert inst.vertex_buffer.vertex_count == 16 * 16 * 6  # Terrain.zig:126
    assert not inst.vertex_buffer.has_buffer               # procedural
    np.testing.assert_allclose(node.bounding_box_p0, [-1.6, 0.0, -1.6])
    np.testing.assert_allclose(node.bounding_box_p1, [1.6, 5.0, 1.6])
    # uniform: identity xform + size (staging holds raw bits; floats
    # are read back through an f32 view)
    u = inst.stores[0].host.view(np.float32)
    np.testing.assert_array_equal(u[:16].reshape(4, 4), np.eye(4))
    assert u[16] == 16.0


def test_terrain_renders_heights():
    """Flat heightmaps render as uniform color = 5h (Terrain.zig:73);
    higher terrain is taller (covers higher scanlines)."""
    rend, window = make_renderer(96, 96)
    terr = Terrain(rend)
    size = 8

    def render_flat(h):
        # camera above the tallest plateau (terrain tops are back-face
        # culled when seen from below, like any heightmap mesh)
        node = terr.create_terrain(np.full((size, size), h, np.float32))
        node.set_xform(math3d.look_at((4.0, 6.0, 0.0), (0, 0, 0), (0, 1, 0)))
        surf = Surface.create_window_scene(rend, window, node)
        surf.set_perspective(math3d.perspective(90, 1.0, 0.1, 200))
        return render_frame(rend, [surf], clear=(1.0, 0.0, 0.0, 1.0))

    fb = render_flat(0.1)
    covered = fb[..., 1] > 0.1  # terrain gray has green; clear red has none
    assert covered.any()
    # color = 5*0.1 = 0.5 gray everywhere on the terrain
    grays = fb[covered]
    np.testing.assert_allclose(grays[:, :3], 0.5, atol=1e-4)

    fb_tall = render_flat(0.5)  # y = 2.5, still below the camera
    covered_tall = fb_tall[..., 1] > 0.1
    grays_tall = fb_tall[covered_tall]
    # raw float fb is unclamped: color = 5h = 2.5 (clamps only at
    # read_pixels, like a unorm swap-chain store)
    np.testing.assert_allclose(grays_tall[:, :3], 2.5, atol=1e-4)
    # taller terrain reaches higher scanlines (nearer the camera view top)
    top_tall = np.nonzero(covered_tall.any(axis=1))[0].min()
    top_flat = np.nonzero(covered.any(axis=1))[0].min()
    assert top_tall < top_flat


def test_polygon_palette_cycling():
    rend, _ = make_renderer()
    poly = Polygon(rend)
    h = poly.create_polygon(POLYGON1)
    rows = h.vertex_buffer._staging
    assert rows.shape == (15, 5)
    for tri in range(5):
        expect = PALETTE[tri % 4]
        for v in range(3):
            np.testing.assert_allclose(rows[tri * 3 + v, 2:5], expect,
                                       atol=1e-6)


def test_polygon_aabb_correct():
    rend, _ = make_renderer()
    poly = Polygon(rend)
    h = poly.create_polygon(POLYGON2)
    node = h.get_node()
    np.testing.assert_allclose(node.bounding_box_p0, [10.0, 10.0, 1.0])
    np.testing.assert_allclose(node.bounding_box_p1, [40.0, 40.0, 1.0])


class TestDemoScene:
    @pytest.fixture(scope="class")
    def frame(self):
        app = DemoApp(width=128, height=128, backend="oracle")
        return app.run(1), app

    def test_clear_color_visible(self, frame):
        fb, app = frame
        # top-right corner: above terrain horizon, outside polygons
        np.testing.assert_allclose(fb[2, 125], CLEAR_COLOR, atol=1e-5)

    def test_square_polygon_position(self, frame):
        fb, app = frame
        # square spans UI [10,40]^2 of 200 -> pixels [6.4, 25.6] at 128.
        # second triangle (upper-left half) is palette[1] mint green;
        # first (lower-right, drawn first) is palette[0] dark purple.
        ui = lambda x: int(x / 200 * 128)
        px = fb[ui(15), ui(20)]  # upper-left half of the square
        mint = np.array([*PALETTE[1], 1.0])
        purple = np.array([*PALETTE[0], 1.0])
        match_mint = np.allclose(px, mint, atol=1e-4)
        match_purple = np.allclose(px, purple, atol=1e-4)
        assert match_mint or match_purple
        # center of square: covered by one of the two triangles
        pc = fb[ui(25), ui(25)]
        assert (np.allclose(pc, mint, atol=1e-4)
                or np.allclose(pc, purple, atol=1e-4))

    def test_heptagon_covered_by_palette(self, frame):
        fb, app = frame
        ui = lambda x: int(x / 200 * 128)
        # centroid-ish interior point of POLYGON1
        px = fb[ui(100), ui(105)]
        palette_rgba = [np.array([*c, 1.0]) for c in PALETTE]
        assert any(np.allclose(px, c, atol=1e-4) for c in palette_rgba), px

    def test_terrain_visible_below_horizon(self, frame):
        fb, app = frame
        # bottom center: terrain (grayscale r==g==b), not clear color
        px = fb[120, 64]
        assert px[0] == px[1] == px[2]
        assert not np.allclose(px, CLEAR_COLOR, atol=1e-3)

    def test_frame_deterministic(self, frame):
        fb, app = frame
        app2 = DemoApp(width=128, height=128, backend="oracle")
        fb2 = app2.run(1)
        np.testing.assert_array_equal(fb, np.asarray(fb2))

    def test_camera_orbits(self, frame):
        fb, app = frame
        fb5 = app.run(5)  # elapsed_time advances -> different view
        assert not np.array_equal(np.asarray(fb), np.asarray(fb5))


def test_terrain_batch_vertex_path_matches_vmap():
    """The dense (gather-free) terrain vertex formulation must agree
    with the per-vertex reference formulation."""
    import jax.numpy as jnp
    from myrenderer_tpu.content.terrain import (_make_vertex_batch_fn,
                                                _make_vertex_fn)
    from myrenderer_tpu.ops import vertex_stage as vs

    size = 16
    rng = np.random.default_rng(0)
    hm = rng.random(size * size).astype(np.float32)
    uniform = np.concatenate([np.eye(4, dtype=np.float32).reshape(-1),
                              [np.float32(size)]])
    world = (math3d.perspective(1.2, 1.0, 0.1, 50.0)
             @ math3d.look_at((3, 4, 2), (0, 0, 0), (0, 1, 0)))
    V = size * size * 6
    vidx = jnp.arange(V, dtype=jnp.int32)
    iids = jnp.zeros(V, jnp.int32)
    worlds = jnp.asarray(world)[None]
    bindings = {0: jnp.asarray(uniform)[None], 1: jnp.asarray(hm)[None]}

    from myrenderer_tpu.ops.raster_common import PlanarTris

    clip_v, vary_v = vs.run_vertex_stage(
        _make_vertex_fn(size), vidx, {}, worlds, iids, bindings)
    clip_b, vary_b = vs.run_vertex_stage(
        None, vidx, {}, worlds, iids, bindings,
        vertex_batch_fn=_make_vertex_batch_fn(size))
    if isinstance(clip_b, PlanarTris):
        # a planar batch fn is also a valid formulation: compare in
        # interleaved layout, restoring submission order via the ids
        # permutation when the producer emits a permuted array order
        tri_clip, tri_vary = clip_b.interleaved()     # [T, 3, 4]
        tri_clip, tri_vary = np.asarray(tri_clip), np.asarray(tri_vary)
        if clip_b.ids is not None:
            order = np.argsort(np.asarray(clip_b.ids))
            tri_clip, tri_vary = tri_clip[order], tri_vary[order]
        clip_b = tri_clip.reshape(V, 4)
        vary_b = tri_vary.reshape(V, 4)
    np.testing.assert_allclose(np.asarray(clip_v), np.asarray(clip_b),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vary_v), np.asarray(vary_b),
                               rtol=1e-6, atol=1e-6)


def test_demo_gif_cli(tmp_path):
    """``--gif`` writes an animated GIF of the orbit — the headless
    presentation stand-in for the reference's animated window
    (``App.zig:40,52``)."""
    from myrenderer_tpu.app.demo import main
    out = tmp_path / "orbit.gif"
    main(["--size", "96x96", "--frames", "3", "--backend", "oracle",
          "--gif", str(out)])
    from PIL import Image
    im = Image.open(out)
    assert im.n_frames == 3 and im.size == (96, 96)
    im.seek(0)
    first = np.asarray(im.convert("RGB")).copy()
    im.seek(2)
    third = np.asarray(im.convert("RGB"))
    assert (first != third).any()     # the camera actually orbits
