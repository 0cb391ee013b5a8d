"""End-to-end render tests through the full public API.

BASELINE.json config[0]: "single flat-shaded triangle to offscreen
Surface", plus transform/culling/multi-surface semantics from the
reference (SURVEY.md §4.3).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from myrenderer_tpu import (Binding, BindingLayout, Core, Draw, Instance,
                            Pipeline, Renderer, SceneNode, Surface,
                            VertexBuffer, VertexLayout, math3d)
from myrenderer_tpu.renderer.pipeline import BUILTIN_TRANSFORM


def make_renderer(w=64, h=64, backend="oracle"):
    core = Core(fixed_timestep=1.0 / 60.0)
    window = core.create_window(w, h, "test")
    rend = Renderer(core, raster_backend=backend)
    rend.adopt_window(window)
    return rend, window


def flat_pipeline(rend):
    """2D colored-vertex pipeline, like the Polygon module's
    (Polygon.zig:31-38): clip pos = world_xform @ (x, y, 1, 1)."""
    layout = VertexLayout.create([("pos", 2), ("color", 3)])

    def vertex_fn(ctx):
        p = ctx.attr("pos")
        pos = jnp.array([p[0], p[1], 1.0, 1.0], jnp.float32)
        clip = ctx.world @ pos
        c = ctx.attr("color")
        return clip, jnp.array([c[0], c[1], c[2], 1.0], jnp.float32)

    return Pipeline.create(
        rend, vertex_fn=vertex_fn,
        bindings=[BindingLayout(0, BUILTIN_TRANSFORM)],
        vertex_layout=layout), layout


def triangle_node(rend, pipeline, layout, pts, color=(1.0, 0.0, 0.0)):
    vb = VertexBuffer.new(rend, 0, len(pts) // 3, layout)
    rows = np.array([[x, y, *color] for x, y in pts], np.float32)
    vb.write_vertices(rows)
    node = Instance.create_node(
        rend, pipeline=pipeline,
        bounding_box_p0=(min(p[0] for p in pts), min(p[1] for p in pts), 0.0),
        bounding_box_p1=(max(p[0] for p in pts), max(p[1] for p in pts), 1.5))
    node.get_backing().set_vertex_buffer(vb)
    return node


def ortho_unit():
    """Maps [0,1]x[0,1] (y-down UI space) onto the full frame."""
    return math3d.projection_2d(left=0.0, right=1.0, bottom=1.0, top=0.0,
                                near=0.1, far=2.0)


def render_frame(rend, surfaces, clear=(0.0, 0.0, 0.0, 1.0)):
    draw = Draw.create(rend)
    draw.begin()
    draw.clear(clear)
    for s in surfaces:
        draw.draw_surface(s)
    fb = draw.end()
    rend.update()
    return np.asarray(fb)


def test_flat_triangle_offscreen():
    rend, window = make_renderer()
    pipe, layout = flat_pipeline(rend)
    # CW in y-down UI space: covers lower-left half-ish of unit square
    node = triangle_node(rend, pipe, layout,
                         [(0.1, 0.1), (0.9, 0.1), (0.1, 0.9)])
    surf = Surface.create_window_scene(rend, window, node)
    surf.set_perspective(ortho_unit())
    fb = render_frame(rend, [surf], clear=(0.0, 0.0, 1.0, 1.0))

    assert fb.shape == (64, 64, 4)
    red = (fb[..., 0] > 0.9) & (fb[..., 1] < 0.1) & (fb[..., 2] < 0.1)
    blue = (fb[..., 2] > 0.9) & (fb[..., 0] < 0.1)
    # interior sample points: UI y=0.2 is near the top of the frame
    assert red[int(0.2 * 64), int(0.2 * 64)]       # inside
    assert blue[int(0.8 * 64), int(0.8 * 64)]      # outside: clear color
    # triangle area fraction = 0.5 * 0.8 * 0.8 = 0.32 of the frame
    frac = red.mean()
    assert 0.28 < frac < 0.36
    # every pixel is either triangle red or clear blue
    assert (red | blue).all()


def test_ccw_triangle_backface_culled():
    rend, window = make_renderer()
    pipe, layout = flat_pipeline(rend)
    node = triangle_node(rend, pipe, layout,
                         [(0.1, 0.1), (0.1, 0.9), (0.9, 0.1)])  # CCW in UI space
    surf = Surface.create_window_scene(rend, window, node)
    surf.set_perspective(ortho_unit())
    fb = render_frame(rend, [surf], clear=(0.0, 0.0, 1.0, 1.0))
    assert (fb[..., 2] > 0.9).all(), "back-facing triangle must be culled"


def test_depth_order_and_ties():
    """Nearer z wins regardless of submission order; the reference's
    'less' compare keeps the first-drawn on exact ties
    (Pipeline.zig:150-154)."""
    rend, window = make_renderer()
    pipe, layout = flat_pipeline(rend)

    def tri_at(z, color):
        layoutless = [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0)]
        vb = VertexBuffer.new(rend, 0, 1, layout)
        vb.write_vertices(np.array(
            [[x, y, *color] for x, y in layoutless], np.float32))
        def vfn(ctx, z=z):
            p = ctx.attr("pos")
            clip = ctx.world @ jnp.array([p[0], p[1], z, 1.0], jnp.float32)
            c = ctx.attr("color")
            return clip, jnp.array([c[0], c[1], c[2], 1.0], jnp.float32)
        pz = Pipeline.create(rend, vertex_fn=vfn,
                             bindings=[BindingLayout(0, BUILTIN_TRANSFORM)],
                             vertex_layout=layout)
        node = Instance.create_node(rend, pipeline=pz,
                                    bounding_box_p0=(0, 0, 0),
                                    bounding_box_p1=(1, 1, 2))
        node.get_backing().set_vertex_buffer(vb)
        return node

    root = SceneNode.create(rend)
    far = tri_at(1.5, (1.0, 0.0, 0.0))
    near = tri_at(0.5, (0.0, 1.0, 0.0))
    root.add_child(far)    # drawn first
    root.add_child(near)   # drawn second, nearer -> wins
    surf = Surface.create_window_scene(rend, window, root)
    surf.set_perspective(ortho_unit())
    fb = render_frame(rend, [surf])
    assert fb[10, 10, 1] > 0.9 and fb[10, 10, 0] < 0.1


def test_scene_transform_propagation():
    """Parent transform composes onto children (SceneNode.zig:91-132)."""
    rend, window = make_renderer()
    pipe, layout = flat_pipeline(rend)
    tri = triangle_node(rend, pipe, layout,
                        [(0.0, 0.0), (0.4, 0.0), (0.0, 0.4)])
    root = SceneNode.create(rend)
    root.add_child(tri)
    root.set_xform(math3d.translate([0.5, 0.5, 0.0]))
    surf = Surface.create_window_scene(rend, window, root)
    surf.set_perspective(ortho_unit())
    fb = render_frame(rend, [surf], clear=(0, 0, 0, 1))
    red = fb[..., 0] > 0.9
    # triangle moved to the middle: UI (0.55, 0.55) inside, (0.1, 0.1) not
    assert red[int(0.55 * 64), int(0.55 * 64)]
    assert not red[int(0.1 * 64), int(0.1 * 64)]


def test_multi_surface_clear_then_load():
    """First surface clears, second composites on top
    (Draw.zig:23-27)."""
    rend, window = make_renderer()
    pipe, layout = flat_pipeline(rend)
    t1 = triangle_node(rend, pipe, layout,
                       [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0)],
                       color=(1.0, 0.0, 0.0))
    t2 = triangle_node(rend, pipe, layout,
                       [(0.5, 0.5), (1.0, 0.5), (0.5, 1.0)],
                       color=(0.0, 1.0, 0.0))
    s1 = Surface.create_window_scene(rend, window, t1)
    s1.set_perspective(ortho_unit())
    s2 = Surface.create_window_scene(rend, window, t2)
    s2.set_perspective(ortho_unit())
    fb = render_frame(rend, [s1, s2], clear=(0, 0, 1, 1))
    # t1 visible top-left, t2 overlays bottom-right-of-center, clear elsewhere
    assert fb[5, 5, 0] > 0.9                       # red from surface 1
    assert fb[int(0.6 * 64), int(0.6 * 64), 1] > 0.9  # green from surface 2
    # outside both: UI (0.98, 0.6): x+y > 1 (outside t1), x+y > 1.5 (outside t2)
    assert fb[int(0.6 * 64), int(0.98 * 64), 2] > 0.9  # clear survives


def test_surface_dedupe_per_frame():
    """A surface draws at most once per frame (working version of
    Surface.zig:136-138's inert guard)."""
    rend, window = make_renderer()
    pipe, layout = flat_pipeline(rend)
    node = triangle_node(rend, pipe, layout,
                         [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0)])
    surf = Surface.create_window_scene(rend, window, node)
    surf.set_perspective(ortho_unit())
    draw = Draw.create(rend)
    draw.begin()
    draw.clear((0, 0, 1, 1))
    draw.draw_surface(surf)
    draw.draw_surface(surf)  # must be ignored
    fb = draw.end()
    assert len(draw._items) == 1
    rend.update()
    # next frame it draws again
    draw.begin()
    draw.clear((0, 0, 1, 1))
    draw.draw_surface(surf)
    assert len(draw._items) == 1


def test_culled_when_behind_camera():
    """Conservative frustum culling drops a node fully outside the
    frustum (intent of SceneNode.zig:111)."""
    rend, window = make_renderer()
    pipe, layout = flat_pipeline(rend)
    node = triangle_node(rend, pipe, layout,
                         [(5.0, 5.0), (6.0, 5.0), (5.0, 6.0)])
    surf = Surface.create_window_scene(rend, window, node)
    surf.set_perspective(ortho_unit())  # view volume is [0,1]^2
    fb = render_frame(rend, [surf], clear=(0, 0, 1, 1))
    assert (fb[..., 2] > 0.9).all()


def test_moved_child_outside_parent_box_still_renders():
    """Hierarchical ancestor-AND culling is unsound and must not exist:
    add_child unions the child box in parent-LOCAL space
    (SceneNode.zig:54-65), so a child moved on-screen by set_xform can
    be visible while its parent's stale box is entirely off-screen.
    cull_aabb's contract: never cull visible geometry."""
    rend, window = make_renderer()
    pipe, layout = flat_pipeline(rend)
    # child geometry lives far off-screen in local space...
    child = triangle_node(rend, pipe, layout,
                          [(5.1, 5.1), (5.9, 5.1), (5.1, 5.9)])
    # ...so the parent's unioned AABB (finite!) is also off-screen
    root = SceneNode.create(rend)
    root.set_bounding_box((4.0, 4.0, 0.0), (7.0, 7.0, 2.0))
    root.add_child(child)
    assert root.has_finite_aabb
    # ...but the child's own transform brings it back on-screen
    child.set_xform(math3d.translate((-5.0, -5.0, 0.0)))
    surf = Surface.create_window_scene(rend, window, root)
    surf.set_perspective(ortho_unit())
    fb = render_frame(rend, [surf], clear=(0, 0, 1, 1))
    red = (fb[..., 0] > 0.9) & (fb[..., 2] < 0.1)
    assert red.any(), "visible child was culled by its parent's stale box"
    assert red[int(0.3 * 64), int(0.3 * 64)]


def test_late_big_list_overflow_triggers_rebuild():
    """Big-list overflow first occurring AFTER the 3-frame synchronous
    window must still bump capacity (async flag checked every frame, one
    frame later) — no silent steady-state triangle drops."""
    from myrenderer_tpu.ops.raster_pallas import RasterConfig

    # chunk 8 = the minimum (VMEM sublane alignment); capacity rounds up
    # to a whole chunk, so 8 is the effective big capacity here
    cfg = RasterConfig(tile_h=8, tile_w=128, max_tiles_per_tri=1,
                       big_capacity=8, chunk=8, interpret=True)

    def build(xform=None):
        rend, window = make_renderer(64, 64, backend="pallas")
        rend.raster_cfg = cfg
        pipe, layout = flat_pipeline(rend)
        # 12 thin triangles inside the first 8px tile row (span = 1
        # tile) — more than the effective big capacity of 8
        pts = []
        for i in range(12):
            x = 0.02 + 0.08 * i
            pts += [(x, 0.02), (x + 0.06, 0.02), (x, 0.1)]
        node = triangle_node(rend, pipe, layout, pts)
        if xform is not None:
            node.set_xform(xform)
        surf = Surface.create_window_scene(rend, window, node)
        surf.set_perspective(ortho_unit())
        return rend, surf, node, Draw.create(rend)

    tall = math3d.scale((1.0, 8.0, 1.0))   # every triangle spans >1 tile
    rend, surf, node, draw = build()

    def frame():
        draw.begin()
        draw.clear((0, 0, 1, 1))
        draw.draw_surface(surf)
        fb = draw.end()
        rend.update()
        return np.asarray(fb)

    for _ in range(4):
        frame()
    assert draw._big_scale == 1
    # frame 5: camera-style change makes all 8 triangles 'big' (> cap 4)
    node.set_xform(tall)
    frame()                      # one frame of drops is allowed...
    assert np.asarray(draw.last_overflow).any()
    fb6 = frame()                # ...then the async flag forces a bump
    assert draw._big_scale >= 2, "late overflow never bumped capacity"
    assert not np.asarray(draw.last_overflow).any()

    # the post-bump frame matches a fresh render of the same scene
    # (whose first-frame sync window bumps immediately)
    rend2, surf2, _node2, draw2 = build(xform=tall)
    draw2.begin()
    draw2.clear((0, 0, 1, 1))
    draw2.draw_surface(surf2)
    ref = np.asarray(draw2.end())
    np.testing.assert_array_equal(fb6, ref)


def test_stream_overflow_triggers_rebuild():
    """Stream-capacity overflow (live incidences > stream_factor *
    big_scale * T) must bump capacity through the same adaptive ladder
    as big-list overflow and publish a correct frame — triangles whose
    incidences fell off the clamped stream tail must appear after the
    bump. Overflows on the first frame, inside the synchronous check
    window, so the very first published frame is already correct."""
    from myrenderer_tpu.ops.raster_pallas import RasterConfig

    # 12 tall thin triangles, each spanning all 8 tile rows of a 64px
    # frame: 96 live incidences against a starved 64-row stream (the
    # _FORCE_STREAM_ROWS hook; real small scenes get a min(NC, 2**17)
    # capacity floor and cannot overflow)
    import myrenderer_tpu.ops.raster_pallas as rp_mod
    cfg = RasterConfig(tile_h=8, tile_w=128, max_tiles_per_tri=8,
                       auto_span=False, stream_factor=0.5,
                       stream_window=64, chunk=8, interpret=True)
    rp_mod._FORCE_STREAM_ROWS = 64
    try:
        rend, window = make_renderer(64, 64, backend="pallas")
        rend.raster_cfg = cfg
        pipe, layout = flat_pipeline(rend)
        pts = []
        for i in range(12):
            x = 0.02 + 0.08 * i
            pts += [(x, 0.02), (x + 0.05, 0.02), (x, 0.98)]
        node = triangle_node(rend, pipe, layout, pts)
        surf = Surface.create_window_scene(rend, window, node)
        surf.set_perspective(ortho_unit())
        draw = Draw.create(rend)

        draw.begin()
        draw.clear((0, 0, 1, 1))
        draw.draw_surface(surf)
        fb = np.asarray(draw.end())
        assert draw._big_scale > 1, \
            "stream overflow never bumped capacity"
        assert not np.asarray(draw.last_overflow).any()

        # every triangle column is visible (red fragments at its base)
        red = (fb[..., 0] > 0.9) & (fb[..., 2] < 0.1)
        for i in range(12):
            x0 = int((0.02 + 0.08 * i) * 64)
            assert red[2:5, x0:x0 + 3].any(), f"triangle {i} dropped"
    finally:
        rp_mod._FORCE_STREAM_ROWS = None

    # and the frame matches the oracle on the same scene
    rend_o, window_o = make_renderer(64, 64, backend="oracle")
    pipe_o, layout_o = flat_pipeline(rend_o)
    node_o = triangle_node(rend_o, pipe_o, layout_o, pts)
    surf_o = Surface.create_window_scene(rend_o, window_o, node_o)
    surf_o.set_perspective(ortho_unit())
    draw_o = Draw.create(rend_o)
    draw_o.begin()
    draw_o.clear((0, 0, 1, 1))
    draw_o.draw_surface(surf_o)
    ref = np.asarray(draw_o.end())
    np.testing.assert_array_equal(fb, ref)


def test_frame_program_cache_reuse():
    rend, window = make_renderer()
    pipe, layout = flat_pipeline(rend)
    node = triangle_node(rend, pipe, layout,
                         [(0.1, 0.1), (0.9, 0.1), (0.1, 0.9)])
    surf = Surface.create_window_scene(rend, window, node)
    surf.set_perspective(ortho_unit())
    draw = Draw.create(rend)
    for _ in range(3):
        draw.begin()
        draw.clear((0, 0, 0, 1))
        draw.draw_surface(surf)
        draw.end()
        rend.update()
    assert len(draw._program_cache) == 1


def test_instanced_draw():
    """instance_count > 1 replicates the draw with
    @builtin(instance_index) exposed to the vertex function
    (VertexBuffer.zig:5-9 draw args)."""
    rend, window = make_renderer()
    layout = VertexLayout.create([("pos", 2), ("color", 3)])

    def vfn(ctx):
        p = ctx.attr("pos")
        # each draw instance shifts right by 0.3 in UI space
        off = ctx.draw_instance.astype(jnp.float32) * 0.3
        clip = ctx.world @ jnp.stack([p[0] + off, p[1],
                                      jnp.float32(1.0), jnp.float32(1.0)])
        c = ctx.attr("color")
        return clip, jnp.stack([c[0], c[1], c[2], jnp.float32(1.0)])

    pipe = Pipeline.create(rend, vertex_fn=vfn,
                           bindings=[BindingLayout(0, BUILTIN_TRANSFORM)],
                           vertex_layout=layout)
    vb = VertexBuffer.new(rend, 0, 1, layout)
    vb.write_vertices(np.array([[0.05, 0.1, 1, 0, 0],
                                [0.25, 0.1, 1, 0, 0],
                                [0.05, 0.5, 1, 0, 0]], np.float32))
    vb.instance_count = 3
    node = Instance.create_node(rend, pipeline=pipe,
                                bounding_box_p0=(0, 0, 0),
                                bounding_box_p1=(1, 1, 2))
    node.get_backing().set_vertex_buffer(vb)
    surf = Surface.create_window_scene(rend, window, node)
    surf.set_perspective(ortho_unit())
    fb = render_frame(rend, [surf], clear=(0, 0, 1, 1))
    red = fb[..., 0] > 0.9
    # three copies at x ~ 0.1, 0.4, 0.7
    for cx in (0.08, 0.38, 0.68):
        assert red[int(0.15 * 64), int(cx * 64)], cx
    assert not red[int(0.15 * 64), int(0.95 * 64)]


def test_frame_stats():
    rend, window = make_renderer()
    rend.collect_stats = True
    pipe, layout = flat_pipeline(rend)
    node = triangle_node(rend, pipe, layout,
                         [(0.1, 0.1), (0.9, 0.1), (0.1, 0.9)])
    surf = Surface.create_window_scene(rend, window, node)
    surf.set_perspective(ortho_unit())
    render_frame(rend, [surf])
    stats = rend.frame_stats
    assert stats["triangles_submitted"] == 1
    assert stats["surfaces"] == 1 and stats["batches"] == 1


def test_textured_pipeline():
    """Texture bindings: an f32[H,W,C] attachment sampled in the vertex
    function (the reference declares texture_view/texture_sampler kinds,
    Pipeline.zig:34-55, but never exercises them)."""
    from myrenderer_tpu.ops.sampling import sample_nearest
    from myrenderer_tpu.renderer.pipeline import TEXTURE_VIEW
    from myrenderer_tpu import Binding

    rend, window = make_renderer()
    layout = VertexLayout.create([("pos", 2), ("uv", 2)])
    # 2x2 checker: red / green
    tex = np.zeros((2, 2, 4), np.float32)
    tex[0, 0] = [1, 0, 0, 1]
    tex[1, 1] = [1, 0, 0, 1]
    tex[0, 1] = [0, 1, 0, 1]
    tex[1, 0] = [0, 1, 0, 1]

    def vfn(ctx):
        p = ctx.attr("pos")
        clip = ctx.world @ jnp.stack([p[0], p[1], jnp.float32(1.0),
                                      jnp.float32(1.0)])
        color = sample_nearest(ctx.binding(1), ctx.attr("uv"))
        return clip, color

    pipe = Pipeline.create(rend, vertex_fn=vfn,
                           bindings=[BindingLayout(0, BUILTIN_TRANSFORM),
                                     BindingLayout(1, TEXTURE_VIEW)],
                           vertex_layout=layout)
    vb = VertexBuffer.new(rend, 0, 1, layout)
    vb.write_vertices(np.array([[0.0, 0.0, 0.2, 0.2],
                                [1.0, 0.0, 0.2, 0.2],
                                [0.0, 1.0, 0.2, 0.2]], np.float32))
    node = Instance.create_node(
        rend, pipeline=pipe,
        bindings=[Binding(1, attachment=tex)],
        bounding_box_p0=(0, 0, 0), bounding_box_p1=(1, 1, 2))
    node.get_backing().set_vertex_buffer(vb)
    surf = Surface.create_window_scene(rend, window, node)
    surf.set_perspective(ortho_unit())
    fb = render_frame(rend, [surf], clear=(0, 0, 1, 1))
    # all three vertices sample texel (0,0) = red
    assert fb[10, 10, 0] > 0.9 and fb[10, 10, 1] < 0.1


def test_u32_binding_roundtrip():
    """Integer uniform fields round-trip bit-exactly through
    update_buffer, like the reference's untyped struct writes
    (Instance.zig:165-187, Terrain.zig:56 'size: u32'). Mixes f32 and
    u32 words in ONE managed binding, including a non-canonical NaN bit
    pattern, plus a raw-bytes write."""
    import struct

    from myrenderer_tpu.ops.vertex_stage import bitcast_u32
    from myrenderer_tpu.renderer.pipeline import UNMANAGED_BUFFER
    from myrenderer_tpu import Binding

    rend, window = make_renderer()
    layout = VertexLayout.create([("pos", 2)])
    weird = np.uint32(0xFFC00123)   # NaN payload bits if read as f32

    def vfn(ctx):
        p = ctx.attr("pos")
        clip = ctx.world @ jnp.stack([p[0], p[1], jnp.float32(1.0),
                                      jnp.float32(1.0)])
        buf = ctx.binding(1)
        scale = buf[0]                          # f32 word
        sel = bitcast_u32(buf[1])               # u32 word
        nanbits = bitcast_u32(buf[2])           # NaN-pattern u32 word
        rawv = bitcast_u32(buf[3])              # raw-bytes u32 word
        ok = ((sel == jnp.uint32(7))
              & (nanbits == jnp.uint32(0xFFC00123))
              & (rawv == jnp.uint32(0xDEADBEEF)))
        g = jnp.where(ok, scale, jnp.float32(0.0))
        return clip, jnp.stack([jnp.float32(0.0), g, jnp.float32(0.0),
                                jnp.float32(1.0)])

    pipe = Pipeline.create(
        rend, vertex_fn=vfn,
        bindings=[BindingLayout(0, BUILTIN_TRANSFORM),
                  BindingLayout(1, UNMANAGED_BUFFER)],
        vertex_layout=layout)
    vb = VertexBuffer.new(rend, 0, 1, layout)
    vb.write_vertices(np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]],
                               np.float32))
    node = Instance.create_node(
        rend, pipeline=pipe, bindings=[Binding(1, size=16)],
        bounding_box_p0=(0, 0, 0), bounding_box_p1=(1, 1, 2))
    inst = node.get_backing()
    inst.update_buffer(1, np.float32(0.75))                # word 0: f32
    inst.update_buffer(1, np.uint32(7), byte_offset=4)     # word 1: u32
    inst.update_buffer(1, weird, byte_offset=8)            # word 2: NaN bits
    inst.update_buffer(1, struct.pack("<I", 0xDEADBEEF),
                       byte_offset=12)                     # word 3: bytes
    inst.set_vertex_buffer(vb)
    surf = Surface.create_window_scene(rend, window, node)
    surf.set_perspective(ortho_unit())
    fb = render_frame(rend, [surf], clear=(0, 0, 1, 1))
    np.testing.assert_allclose(fb[10, 10], [0.0, 0.75, 0.0, 1.0],
                               atol=1e-6)


@pytest.mark.parametrize("backend", ["oracle", "pallas"])
def test_eye_straddling_triangle_renders(backend):
    """A triangle with a vertex behind the eye renders its visible part
    (fixed-function near clipping, Pipeline.zig:137-161) instead of
    vanishing whole — through the full Draw path, both backends."""
    rend, window = make_renderer(64, 64, backend=backend)
    layout = VertexLayout.create([("pos", 2)])
    verts = jnp.asarray(np.array([[-0.8, -0.5, 0.5, 1.0],
                                  [0.0, 2.0, -0.5, -1.0],
                                  [0.8, -0.5, 0.5, 1.0]], np.float32))

    def vfn(ctx):
        clip = verts[ctx.vertex_index % 3]
        return clip, jnp.array([1.0, 0.0, 0.0, 1.0], jnp.float32)

    pipe = Pipeline.create(rend, vertex_fn=vfn,
                           bindings=[BindingLayout(0, BUILTIN_TRANSFORM)],
                           vertex_layout=layout)
    vb = VertexBuffer.new(rend, 0, 1, layout)
    vb.write_vertices(np.zeros((3, 2), np.float32))
    node = Instance.create_node(rend, pipeline=pipe)
    node.get_backing().set_vertex_buffer(vb)
    surf = Surface.create_window_scene(rend, window, node)
    surf.set_perspective(math3d.identity())
    fb = render_frame(rend, [surf], clear=(0, 0, 1, 1))
    red = (fb[..., 0] > 0.9) & (fb[..., 2] < 0.1)
    assert red.sum() > 300, "visible part of the straddler must render"
    # the wedge opens upward from the two in-front vertices: the bottom
    # rows between them are covered, the very top row is not... the
    # external part wraps through infinity above, so check a known
    # interior point (NDC (0, -0.4) ~ pixel (0.7H, 0.5W))
    assert red[int(0.7 * 64), 32]


def test_window_resize():
    """Surface.resize reallocates the framebuffer and subsequent frames
    render at the new size (Surface.zig:76-101 intent)."""
    rend, window = make_renderer(64, 64)
    pipe, layout = flat_pipeline(rend)
    node = triangle_node(rend, pipe, layout,
                         [(0.1, 0.1), (0.9, 0.1), (0.1, 0.9)])
    surf = Surface.create_window_scene(rend, window, node)
    surf.set_perspective(ortho_unit())
    fb = render_frame(rend, [surf], clear=(0, 0, 1, 1))
    assert fb.shape == (64, 64, 4)
    surf.resize((96, 48))
    fb2 = render_frame(rend, [surf], clear=(0, 0, 1, 1))
    assert fb2.shape == (48, 96, 4)
    assert (fb2[..., 0] > 0.9).any()


def test_empty_surface():
    """A surface whose scene has no drawable instances renders as pure
    clear color (no zero-sized device ops)."""
    rend, window = make_renderer()
    empty = SceneNode.create(rend)
    surf = Surface.create_window_scene(rend, window, empty)
    surf.set_perspective(ortho_unit())
    fb = render_frame(rend, [surf], clear=(0, 0, 1, 1))
    assert (fb[..., 2] > 0.9).all()


@pytest.mark.parametrize("use_bilinear", [0.0, 1.0])
def test_texture_sampler_binding_kind(use_bilinear):
    """texture_sampler bindings carry filtering-parameter arrays the
    vertex/fragment functions consume explicitly (Pipeline.zig:111
    declares a 'filtering' sampler; there is no fixed-function sampler
    on a TPU). The sampled uv sits where nearest and bilinear disagree,
    so a regression in sampler-parameter plumbing fails one case."""
    from myrenderer_tpu.ops.sampling import sample_bilinear, sample_nearest
    from myrenderer_tpu.renderer.pipeline import (TEXTURE_SAMPLER,
                                                  TEXTURE_VIEW)
    from myrenderer_tpu import Binding

    rend, window = make_renderer()
    layout = VertexLayout.create([("pos", 2), ("uv", 2)])
    tex = np.zeros((2, 2, 4), np.float32)
    tex[:, :] = [0, 0, 1, 1]
    tex[0, 0] = [1, 0, 0, 1]

    def vfn(ctx):
        p = ctx.attr("pos")
        clip = ctx.world @ jnp.stack([p[0], p[1], jnp.float32(1.0),
                                      jnp.float32(1.0)])
        # sampler params: [use_bilinear] — selects the filter
        bilinear = ctx.binding(2)[0] > 0.5
        col = jnp.where(bilinear,
                        sample_bilinear(ctx.binding(1), ctx.attr("uv")),
                        sample_nearest(ctx.binding(1), ctx.attr("uv")))
        return clip, col

    pipe = Pipeline.create(
        rend, vertex_fn=vfn,
        bindings=[BindingLayout(0, BUILTIN_TRANSFORM),
                  BindingLayout(1, TEXTURE_VIEW),
                  BindingLayout(2, TEXTURE_SAMPLER)],
        vertex_layout=layout)
    vb = VertexBuffer.new(rend, 0, 1, layout)
    # uv (0.5, 0.5): texture center. nearest -> texel (1,1) = blue;
    # bilinear -> average of all four texels = (0.25, 0, 0.75, 1)
    vb.write_vertices(np.array([[0.0, 0.0, 0.5, 0.5],
                                [1.0, 0.0, 0.5, 0.5],
                                [0.0, 1.0, 0.5, 0.5]], np.float32))
    node = Instance.create_node(
        rend, pipeline=pipe,
        bindings=[Binding(1, attachment=tex),
                  Binding(2, attachment=np.array([use_bilinear],
                                                 np.float32))],
        bounding_box_p0=(0, 0, 0), bounding_box_p1=(1, 1, 2))
    node.get_backing().set_vertex_buffer(vb)
    surf = Surface.create_window_scene(rend, window, node)
    surf.set_perspective(ortho_unit())
    fb = render_frame(rend, [surf], clear=(0, 1, 0, 1))
    if use_bilinear:
        np.testing.assert_allclose(fb[10, 10], [0.25, 0.0, 0.75, 1.0],
                                   atol=1e-5)
    else:
        np.testing.assert_allclose(fb[10, 10], [0.0, 0.0, 1.0, 1.0],
                                   atol=1e-5)


def test_planar_batch_vertex_interface():
    """A pipeline whose batch vertex fn emits a PLANAR batch
    (raster_common.PlanarTris) renders pixel-identically to the same
    geometry through the interleaved vmapped path — covering the planar
    end-to-end lane through Draw/clip_near/triangle_setup/binning.

    The two triangles overlap at DISTINCT depths on purpose: the planar
    and vmapped vertex stages are structurally different XLA graphs, so
    setup-plane coefficients can legitimately differ by 1 ulp (fusion
    context), and an artificial EXACT depth tie would let that wobble
    flip the id tie-break. Cross-formulation bit-identity is guaranteed
    for coverage/winner decisions (edge planes, separated depths) and
    hence pixels — not for coplanar exact ties (degenerate input)."""
    from myrenderer_tpu.ops.raster_common import PlanarTris

    pts = np.array([[0.1, 0.1], [0.9, 0.2], [0.2, 0.9],
                    [0.5, 0.05], [0.95, 0.6], [0.6, 0.5]], np.float32)
    zs = np.array([1.0, 0.6], np.float32)   # tri1 in front where they
                                            # overlap (no depth ties)

    def vertex_fn(ctx):
        vi = ctx.vertex_index
        p = jnp.asarray(pts)[vi]
        z = jnp.asarray(zs)[vi // 3]
        clip = ctx.world @ jnp.array([p[0], p[1], z, 1.0], jnp.float32)
        return clip, jnp.array([0.2, 0.9, 0.4, 1.0], jnp.float32)

    def vertex_batch_fn(ctx):
        w = ctx.worlds[0]                                  # [4, 4]
        p = jnp.asarray(pts).reshape(2, 3, 2)              # [T, 3, 2]
        hom = jnp.stack([p[:, :, 0], p[:, :, 1],
                         jnp.broadcast_to(jnp.asarray(zs)[:, None],
                                          (2, 3)),
                         jnp.ones((2, 3))], -1)
        clip = jnp.einsum("ab,tkb->tka", w, hom)           # [T, 3, 4]
        vary = jnp.broadcast_to(
            jnp.array([0.2, 0.9, 0.4, 1.0], jnp.float32), (2, 3, 4))
        return PlanarTris.from_interleaved(clip, vary)

    def build(batch):
        rend, window = make_renderer(64, 64, backend="pallas")
        rend.debug_winner = True
        pipe = Pipeline.create(
            rend, vertex_fn=vertex_fn,
            vertex_batch_fn=vertex_batch_fn if batch else None,
            bindings=[BindingLayout(0, BUILTIN_TRANSFORM)])
        vb = VertexBuffer.new(rend, 0, 2)    # 2 tris, buffer-less
        node = Instance.create_node(rend, pipeline=pipe)
        node.get_backing().set_vertex_buffer(vb)
        surf = Surface.create_window_scene(rend, window, node)
        surf.set_perspective(ortho_unit())
        fb = render_frame(rend, [surf], clear=(0, 0, 1, 1))
        return fb, [np.asarray(w) for w in rend.draws[0].last_winners]

    planar_fb, planar_win = build(batch=True)
    vmapped_fb, vmapped_win = build(batch=False)
    for wp, wv in zip(planar_win, vmapped_win):
        np.testing.assert_array_equal(wp, wv)   # decision-exact
    assert (planar_win[0] >= 0).sum() > 100     # both tris visible
    np.testing.assert_array_equal(planar_fb, vmapped_fb)


def test_heterogeneous_fragment_programs_merge_into_one_pass():
    """Two pipelines with DIFFERENT fragment programs render in ONE
    merged bin+kernel pass (shaded per winner-id range), pixels matching
    the sequential per-batch path — the reference's render pass mixes
    pipelines freely inside one submit (Draw.zig:23-34)."""
    import unittest.mock as mock

    from myrenderer_tpu.renderer import draw as draw_mod

    def build():
        rend, window = make_renderer(64, 64, backend="pallas")
        rend.debug_winner = True
        rend.collect_stats = True
        pipe_a, layout = flat_pipeline(rend)

        def inverted_fragment(c):
            return jnp.concatenate([1.0 - c[..., :3], c[..., 3:]], -1)

        def vfn(ctx):
            p = ctx.attr("pos")
            clip = ctx.world @ jnp.array([p[0], p[1], 1.0, 1.0],
                                         jnp.float32)
            c = ctx.attr("color")
            return clip, jnp.array([c[0], c[1], c[2], 1.0], jnp.float32)

        pipe_b = Pipeline.create(
            rend, vertex_fn=vfn, fragment_fn=inverted_fragment,
            bindings=[BindingLayout(0, BUILTIN_TRANSFORM)],
            vertex_layout=layout)
        root = SceneNode.create(rend)
        root.add_child(triangle_node(rend, pipe_a, layout,
                                     [(0.1, 0.1), (0.9, 0.1), (0.1, 0.9)],
                                     color=(1, 0, 0)))
        root.add_child(triangle_node(rend, pipe_b, layout,
                                     [(0.3, 0.9), (0.9, 0.3), (0.9, 0.9)],
                                     color=(1, 0, 0)))
        surf = Surface.create_window_scene(rend, window, root)
        surf.set_perspective(ortho_unit())
        return rend, surf

    rend, surf = build()
    fb_merged = render_frame(rend, [surf], clear=(0, 0, 1, 1))
    assert rend.frame_stats["merged"] is True
    assert rend.frame_stats["fragment_programs"] == 2
    win_merged = np.asarray(rend.draws[0].last_winners[0])

    rend2, surf2 = build()
    with mock.patch.object(draw_mod, "_mergeable", lambda plan: False):
        fb_seq = render_frame(rend2, [surf2], clear=(0, 0, 1, 1))
    assert rend2.frame_stats["merged"] is False
    wins_seq = [np.asarray(w) for w in rend2.draws[0].last_winners]

    # both fragment programs visible: passthrough red + inverted cyan
    red = (fb_merged[..., 0] > 0.9) & (fb_merged[..., 1] < 0.1) \
        & (fb_merged[..., 2] < 0.1)
    cyan = (fb_merged[..., 0] < 0.1) & (fb_merged[..., 1] > 0.9) \
        & (fb_merged[..., 2] > 0.9)
    assert red.any() and cyan.any()
    np.testing.assert_allclose(fb_merged, fb_seq, atol=1e-5)
    # coverage decisions agree (merged winners are global ids, the
    # sequential passes' are per-batch-local, so compare coverage)
    np.testing.assert_array_equal(
        win_merged >= 0, (wins_seq[0] >= 0) | (wins_seq[1] >= 0))


def test_precompile_capacity_bump_warms_next_plan():
    """Renderer.precompile_capacity_bump: after a frame, the NEXT
    capacity-ladder step's frame program is compiled in the background,
    so an overflow bump re-renders against a warm cache (no recompile
    stall). The warmed plan must live in the program cache at
    big_scale*4 and render correctly once the bump happens."""
    from myrenderer_tpu.ops.raster_pallas import RasterConfig

    rend, window = make_renderer(64, 64, backend="pallas")
    rend.precompile_capacity_bump = True
    rend.raster_cfg = RasterConfig(tile_h=8, tile_w=128,
                                   max_tiles_per_tri=1, big_capacity=8,
                                   chunk=8, interpret=True,
                                   auto_span=False)
    pipe, layout = flat_pipeline(rend)
    pts = []
    for i in range(12):   # 12 tall triangles: span > 1 tile -> big list
        y = 0.03 + 0.06 * i
        pts += [(0.05, y), (0.95, y), (0.05, y + 0.25)]
    node = triangle_node(rend, pipe, layout, pts)
    surf = Surface.create_window_scene(rend, window, node)
    surf.set_perspective(ortho_unit())

    draw = Draw.create(rend)
    draw.begin()
    draw.clear((0, 0, 1, 1))
    draw.draw_surface(surf)
    fb = draw.end()
    rend.update()
    # overflow detected synchronously right after build: capacity bumped
    assert draw._big_scale > 1
    # wait for the background warm of the NEXT step and check the cache
    args = draw._gather_args(
        next(iter(draw._program_cache.values())), window)
    draw._maybe_warm_next_capacity(window, args, block=True)
    scales = {k[7] for k in draw._program_cache}
    assert draw._big_scale * 4 in scales, \
        f"next ladder step not warmed: cached scales {scales}"
    # the rendered frame (post-bump) shows all 12 triangles
    fb = np.asarray(fb)
    red_rows = ((fb[..., 0] > 0.9) & (fb[..., 2] < 0.1)).any(axis=1)
    assert red_rows.sum() >= 10


def test_event_driven_window_lifecycle():
    """mach.Core event-queue parity (App.zig:43-95 /
    SURVEY.md section 2.5): create_window enqueues window_open (the
    reference defers scene construction to it), resize_window enqueues
    framebuffer_resize, request_close latches should_close via
    next_event."""
    from myrenderer_tpu.renderer import Core

    core = Core(fixed_timestep=1.0 / 60.0)
    win = core.create_window(64, 32, "events")
    ev = core.next_event()
    assert ev is not None and ev.kind == "window_open"
    assert ev.window is win
    assert core.next_event() is None

    core.resize_window(win, 128, 32)
    ev = core.next_event()
    assert ev.kind == "framebuffer_resize" and ev.window is win
    assert win.framebuffer.shape == (32, 128, 4)

    assert not core.should_close
    core.request_close(win)
    assert core.next_event().kind == "close"
    assert core.should_close


def test_vertex_buffer_refcounting():
    """Instance.set_vertex_buffer refcounts buffer lifetimes
    (Instance.zig:189-198): swapping releases the old buffer, shared
    buffers survive until the last holder lets go."""
    from myrenderer_tpu.renderer import (Core, Instance, Pipeline,
                                         Renderer, VertexBuffer)
    from myrenderer_tpu.renderer.pipeline import (BUILTIN_TRANSFORM,
                                                  BindingLayout)
    from myrenderer_tpu.content.polygon import Polygon

    core = Core()
    win = core.create_window(32, 32, "rc")
    rend = Renderer(core, raster_backend="oracle")
    rend.adopt_window(win)
    mod = Polygon(rend)

    layout = Polygon.GPU_VERTEX_LAYOUT
    vb1 = VertexBuffer.new(rend, 0, 2, layout)
    vb2 = VertexBuffer.new(rend, 0, 2, layout)
    node_a = Instance.create_node(rend, pipeline=mod.pipeline)
    node_b = Instance.create_node(rend, pipeline=mod.pipeline)
    a, b = node_a.get_backing(), node_b.get_backing()

    a.set_vertex_buffer(vb1)
    b.set_vertex_buffer(vb1)          # shared: refcount 2
    assert vb1.refcount == 2 and vb1.has_buffer
    a.set_vertex_buffer(vb2)          # a lets go; vb1 survives via b
    assert vb1.refcount == 1 and vb1.has_buffer
    assert vb2.refcount == 1
    b.set_vertex_buffer(vb2)          # last holder gone -> freed
    assert vb1.refcount == 0 and not vb1.has_buffer
    assert vb2.refcount == 2


# ---------------------------------------------------------------------------
# fragment-stage binding access (FragmentCtx)
# ---------------------------------------------------------------------------

def _checker_texture(n=4):
    """n x n red/green checker."""
    tex = np.zeros((n, n, 4), np.float32)
    for y in range(n):
        for x in range(n):
            tex[y, x] = [1, 0, 0, 1] if (x + y) % 2 == 0 else [0, 1, 0, 1]
    return tex


def _textured_quad(rend, tex):
    """A [0.1,0.9]^2 quad (two CW triangles) whose fragment program
    samples the texture at the interpolated per-PIXEL UV — the
    fragment-stage resource access the reference's texture_view /
    texture_sampler binding kinds imply (Pipeline.zig:34-55; in WebGPU
    those are fragment-stage bind-group entries)."""
    from myrenderer_tpu.ops.sampling import sample_nearest
    from myrenderer_tpu.renderer.pipeline import TEXTURE_VIEW

    layout = VertexLayout.create([("pos", 2), ("uv", 2)])

    def vfn(ctx):
        p = ctx.attr("pos")
        clip = ctx.world @ jnp.stack([p[0], p[1], jnp.float32(1.0),
                                      jnp.float32(1.0)])
        uv = ctx.attr("uv")
        return clip, jnp.stack([uv[0], uv[1], jnp.float32(0.0),
                                jnp.float32(1.0)])

    def ffn(vary, ctx):
        return sample_nearest(ctx.binding(1), vary[..., :2])

    pipe = Pipeline.create(
        rend, vertex_fn=vfn, fragment_fn=ffn,
        bindings=[BindingLayout(0, BUILTIN_TRANSFORM),
                  BindingLayout(1, TEXTURE_VIEW)],
        vertex_layout=layout)
    assert pipe.fragment_uses_ctx
    vb = VertexBuffer.new(rend, 0, 2, layout)
    lo, hi = 0.1, 0.9
    vb.write_vertices(np.array([           # CW in y-down UI space
        [lo, lo, 0, 0], [hi, lo, 1, 0], [lo, hi, 0, 1],
        [hi, lo, 1, 0], [hi, hi, 1, 1], [lo, hi, 0, 1]], np.float32))
    node = Instance.create_node(
        rend, pipeline=pipe, bindings=[Binding(1, attachment=tex)],
        bounding_box_p0=(0, 0, 0), bounding_box_p1=(1, 1, 2))
    node.get_backing().set_vertex_buffer(vb)
    return node


@pytest.mark.parametrize("backend", ["oracle", "pallas"])
def test_fragment_ctx_per_pixel_sampling(backend):
    """Per-PIXEL UV texture sampling through fragment-stage bindings:
    a single triangle's interior shows MULTIPLE texel colors — which
    per-vertex sampling cannot express (the round-4 capability hole:
    fragment programs previously saw only the 4 varyings)."""
    rend, window = make_renderer(backend=backend)
    tex = _checker_texture(4)
    node = _textured_quad(rend, tex)
    surf = Surface.create_window_scene(rend, window, node)
    surf.set_perspective(ortho_unit())
    fb = render_frame(rend, [surf], clear=(0, 0, 1, 1))

    def at(u, v):
        return fb[int((0.1 + 0.8 * v) * 64), int((0.1 + 0.8 * u) * 64)]

    # texel centers along the top row of the LOWER-LEFT triangle
    # (u + v <= 1): alternating red/green inside one triangle
    assert at(0.12, 0.12)[0] > 0.9 and at(0.12, 0.12)[1] < 0.1
    assert at(0.37, 0.12)[1] > 0.9 and at(0.37, 0.12)[0] < 0.1
    assert at(0.62, 0.12)[0] > 0.9
    assert at(0.12, 0.37)[1] > 0.9
    # outside the quad: clear color
    assert fb[2, 2, 2] > 0.9


def test_fragment_ctx_backends_agree():
    fbs = {}
    for backend in ("oracle", "pallas"):
        rend, window = make_renderer(backend=backend)
        node = _textured_quad(rend, _checker_texture(4))
        surf = Surface.create_window_scene(rend, window, node)
        surf.set_perspective(ortho_unit())
        fbs[backend] = render_frame(rend, [surf], clear=(0, 0, 1, 1))
    # nearest-neighbour sampling quantizes away interpolation ulps
    # everywhere except texel boundaries; require near-total agreement
    same = np.all(fbs["oracle"] == fbs["pallas"], axis=-1)
    assert same.mean() > 0.995


def test_fragment_ctx_merges_with_flat_batches():
    """A ctx-consuming fragment program coexists with ctx-free batches
    in ONE merged raster pass (pallas backend): the textured quad and a
    flat triangle render correctly and the frame stays merged."""
    rend, window = make_renderer(backend="pallas")
    rend.collect_stats = True
    tex_node = _textured_quad(rend, _checker_texture(4))
    pipe, layout = flat_pipeline(rend)
    tri = triangle_node(rend, pipe, layout,
                        [(0.0, 0.0), (0.12, 0.0), (0.0, 0.12)],
                        color=(1.0, 1.0, 0.0))
    root = SceneNode.create(rend)
    root.add_child(tex_node)
    root.add_child(tri)
    surf = Surface.create_window_scene(rend, window, root)
    surf.set_perspective(ortho_unit())
    fb = render_frame(rend, [surf], clear=(0, 0, 1, 1))
    assert rend.frame_stats["merged"]
    assert rend.frame_stats["fragment_programs"] == 2
    # flat triangle (in front at z=1? same z — drawn later, but merged
    # pass keeps within-surface submission depth ties): corner pixel
    assert fb[1, 1, 0] > 0.9 and fb[1, 1, 1] > 0.9     # yellow
    # textured quad interior
    assert fb[int(0.22 * 64), int(0.22 * 64), 0] > 0.9  # red texel


def test_fragment_ctx_instances_not_coalesced():
    """Two instances of one ctx-consuming pipeline must NOT share a
    batch: each instance's fragment program runs with its OWN bindings
    (here: different 1x1 textures -> different flat colors)."""
    from myrenderer_tpu.ops.sampling import sample_nearest
    from myrenderer_tpu.renderer.pipeline import TEXTURE_VIEW

    rend, window = make_renderer(backend="pallas")
    layout = VertexLayout.create([("pos", 2), ("uv", 2)])

    def vfn(ctx):
        p = ctx.attr("pos")
        clip = ctx.world @ jnp.stack([p[0], p[1], jnp.float32(1.0),
                                      jnp.float32(1.0)])
        uv = ctx.attr("uv")
        return clip, jnp.stack([uv[0], uv[1], jnp.float32(0.0),
                                jnp.float32(1.0)])

    def ffn(vary, ctx):
        return sample_nearest(ctx.binding(1), vary[..., :2])

    pipe = Pipeline.create(
        rend, vertex_fn=vfn, fragment_fn=ffn,
        bindings=[BindingLayout(0, BUILTIN_TRANSFORM),
                  BindingLayout(1, TEXTURE_VIEW)],
        vertex_layout=layout)

    def tri_at(x0, tex):
        vb = VertexBuffer.new(rend, 0, 1, layout)
        vb.write_vertices(np.array([
            [x0, 0.1, 0.5, 0.5], [x0 + 0.3, 0.1, 0.5, 0.5],
            [x0, 0.6, 0.5, 0.5]], np.float32))
        node = Instance.create_node(
            rend, pipeline=pipe, bindings=[Binding(1, attachment=tex)],
            bounding_box_p0=(0, 0, 0), bounding_box_p1=(1, 1, 2))
        node.get_backing().set_vertex_buffer(vb)
        return node

    cyan = np.array([[[0, 1, 1, 1]]], np.float32)
    magenta = np.array([[[1, 0, 1, 1]]], np.float32)
    root = SceneNode.create(rend)
    root.add_child(tri_at(0.05, cyan))
    root.add_child(tri_at(0.55, magenta))
    surf = Surface.create_window_scene(rend, window, root)
    surf.set_perspective(ortho_unit())
    fb = render_frame(rend, [surf], clear=(0, 0, 0, 1))
    a = fb[int(0.2 * 64), int(0.12 * 64)]
    b = fb[int(0.2 * 64), int(0.62 * 64)]
    assert a[1] > 0.9 and a[2] > 0.9 and a[0] < 0.1      # cyan
    assert b[0] > 0.9 and b[2] > 0.9 and b[1] < 0.1      # magenta


def test_fragment_fn_bad_arity_rejected_at_create():
    rend, _ = make_renderer()
    with pytest.raises(ValueError, match="fragment_fn must take"):
        Pipeline.create(rend, vertex_fn=lambda ctx: None,
                        fragment_fn=lambda v, ctx, extra: v)


def test_clear_color_cache_bounded():
    """An app animating its clear color must not leak one device array
    per distinct color (ADVICE r4): the by-value cache evicts past 64
    entries, and rendering stays correct across evictions."""
    rend, window = make_renderer()
    pipe, layout = flat_pipeline(rend)
    node = triangle_node(rend, pipe, layout,
                         [(0.1, 0.1), (0.9, 0.1), (0.1, 0.9)])
    surf = Surface.create_window_scene(rend, window, node)
    surf.set_perspective(ortho_unit())
    draw = Draw.create(rend)
    for i in range(80):
        g = (i + 1) / 100.0
        draw.begin()
        draw.clear((0.0, g, 0.0, 1.0))
        draw.draw_surface(surf)
        fb = draw.end()
        rend.update()
        assert len(draw._clear_cache) <= 64
    # the final frame actually used the final color
    assert abs(float(np.asarray(fb)[2, 60, 1]) - 0.80) < 1e-6


def test_fragment_arity_contract():
    """FragmentCtx opt-in rules: a second REQUIRED positional param, or
    one defaulted and NAMED ``ctx`` (so ``f(vary, ctx=None)`` receives
    its bindings instead of silently shading with ctx=None); ``*args``
    callables keep the classic single-argument call (round-5 review:
    these were rejected at create despite being previously valid)."""
    from myrenderer_tpu.renderer.pipeline import _fragment_arity
    assert _fragment_arity(lambda v: v) == 1
    assert _fragment_arity(lambda v, ctx: v) == 2
    assert _fragment_arity(lambda v, ctx=None: v) == 2
    assert _fragment_arity(lambda v, scale=2.0: v) == 1   # not a ctx
    assert _fragment_arity(lambda *a: a[0]) == 1          # classic call

    def two_req_then_var(v, ctx, *rest):
        return v

    assert _fragment_arity(two_req_then_var) == 2
    with pytest.raises(ValueError, match="fragment_fn must take"):
        _fragment_arity(lambda: None)


def test_wrong_varying_count_attributed():
    """A vertex function emitting != 4 varying channels fails with the
    pipeline attributed, not deep inside pack_coeffs_full."""
    rend, window = make_renderer(backend="pallas")
    layout = VertexLayout.create([("pos", 2)])

    def bad_vfn(ctx):
        p = ctx.attr("pos")
        clip = ctx.world @ jnp.stack([p[0], p[1], jnp.float32(1.0),
                                      jnp.float32(1.0)])
        return clip, jnp.stack([p[0], p[1]])     # 2 channels: wrong

    pipe = Pipeline.create(rend, vertex_fn=bad_vfn,
                           bindings=[BindingLayout(0, BUILTIN_TRANSFORM)],
                           vertex_layout=layout)
    vb = VertexBuffer.new(rend, 0, 1, layout)
    vb.write_vertices(np.array([[0.1, 0.1], [0.9, 0.1], [0.1, 0.9]],
                               np.float32))
    node = Instance.create_node(rend, pipeline=pipe,
                                bounding_box_p0=(0, 0, 0),
                                bounding_box_p1=(1, 1, 2))
    node.get_backing().set_vertex_buffer(vb)
    surf = Surface.create_window_scene(rend, window, node)
    surf.set_perspective(ortho_unit())
    with pytest.raises(ValueError, match="bad_vfn.*2 varying channels"):
        render_frame(rend, [surf])


class _NeverReadyFlag:
    """Simulates a device->host overflow-flag copy that never becomes
    ready (worst-case relay latency): is_ready() is always False, but a
    blocking read (np.asarray) still works — exactly the force-drain
    path's view of a stuck flag."""

    def __init__(self, arr):
        self._arr = arr

    def is_ready(self):
        return False

    def __array__(self, dtype=None, copy=None):
        a = np.asarray(self._arr)
        return a if dtype is None else a.astype(dtype)


def test_overflow_detection_window_is_bounded():
    """The worst-case published-drop window is Draw.OVERFLOW_WINDOW
    frames, even when overflow flags NEVER become host-ready: the
    force-drain bound blocks on the oldest flag once the queue exceeds
    the window, so a steady-state overflow is always detected and
    capacity bumped within OVERFLOW_WINDOW + 1 frames.
    frame_stats['overflow_risk_frames'] reports the live window."""
    from myrenderer_tpu.ops.raster_pallas import RasterConfig

    cfg = RasterConfig(tile_h=8, tile_w=128, max_tiles_per_tri=1,
                       big_capacity=8, chunk=8, interpret=True)
    rend, window = make_renderer(64, 64, backend="pallas")
    rend.collect_stats = True
    rend.raster_cfg = cfg
    pipe, layout = flat_pipeline(rend)
    pts = []
    for i in range(12):
        x = 0.02 + 0.08 * i
        pts += [(x, 0.02), (x + 0.06, 0.02), (x, 0.1)]
    node = triangle_node(rend, pipe, layout, pts)
    surf = Surface.create_window_scene(rend, window, node)
    surf.set_perspective(ortho_unit())
    draw = Draw.create(rend)

    def frame():
        draw.begin()
        draw.clear((0, 0, 1, 1))
        draw.draw_surface(surf)
        draw.end()
        rend.update()
        # worst case: no flag ever becomes ready on its own
        draw._pending_overflow = [
            f if isinstance(f, _NeverReadyFlag) else _NeverReadyFlag(f)
            for f in draw._pending_overflow]

    for _ in range(4):
        frame()
    assert draw._big_scale == 1
    assert rend.frame_stats["overflow_risk_frames"] == Draw.OVERFLOW_WINDOW

    # every triangle becomes 'big' -> steady-state overflow
    node.set_xform(math3d.scale((1.0, 8.0, 1.0)))
    detected_after = None
    for i in range(Draw.OVERFLOW_WINDOW + 2):
        frame()
        if draw._big_scale > 1:
            detected_after = i
            break
    assert detected_after is not None, (
        "overflow never detected with never-ready flags — the "
        "force-drain bound is broken")
    assert detected_after <= Draw.OVERFLOW_WINDOW, (
        f"drop window {detected_after} exceeds the documented "
        f"OVERFLOW_WINDOW={Draw.OVERFLOW_WINDOW}")
    # the detecting frame re-rendered before publishing
    assert not np.asarray(draw.last_overflow).any()

    # strict mode reports a zero-frame window
    rend.strict_overflow = True
    frame()
    assert rend.frame_stats["overflow_risk_frames"] == 0

    # capacity ladder capped: flag checking is skipped entirely (even
    # under strict), so the risk field must say unbounded (-1), never
    # a false "checked synchronously" 0 (round-5 review)
    rend.strict_overflow = False
    draw._big_scale = 256
    frame()
    assert rend.frame_stats["overflow_risk_frames"] == -1
