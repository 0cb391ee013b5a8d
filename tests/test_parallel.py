"""Multi-chip sharded rendering on the 8-device virtual CPU mesh
(SURVEY.md §4.4 / §5.8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myrenderer_tpu.ops import raster_common as rc
from myrenderer_tpu.ops import raster_ref as rr
from myrenderer_tpu.parallel import make_mesh, sharded_render_step

from test_raster_pallas import random_triangles


@pytest.mark.parametrize("backend", ["oracle", "pallas"])
@pytest.mark.parametrize("rows,tris", [(8, 1), (4, 2), (2, 4)])
def test_sharded_matches_single_device(rows, tris, backend):
    from test_raster_pallas import CFG

    H, W = 16 * rows, 128
    T = 24  # divisible by all tris-axis sizes
    clip, vary = random_triangles(T, seed=3)
    valid = jnp.ones(T, bool)
    fb = jnp.zeros((H, W, 4), jnp.float32)

    mesh = make_mesh(8, rows=rows, tris=tris)
    step = sharded_render_step(
        mesh, H, W, return_winner=True,
        raster_cfg=CFG if backend == "pallas" else None)
    out, winner = step(clip, vary, valid, fb)
    out, winner = np.asarray(out), np.asarray(winner)

    tc = rc.triangle_setup(clip, vary, valid, W, H)
    _ref_depth, ref_winner = jax.jit(
        rr.rasterize_visibility, static_argnums=(1, 2))(tc, H, W)
    ref_fb, _ = rr.rasterize(clip, vary, valid, fb,
                             jnp.full((H, W), 1.0, jnp.float32),
                             lambda c: c)
    # Winner DECISIONS are exact: both sides consume the same
    # raster_common rules over identical coefficient math.
    np.testing.assert_array_equal(winner, np.asarray(ref_winner))
    # Shaded RGBA still allows edge-pixel FMA wiggle between programs.
    ref = np.asarray(ref_fb)
    mismatched = (~np.isclose(out, ref, atol=1e-5)).any(axis=-1)
    assert mismatched.mean() < 1e-3, f"{mismatched.sum()} pixels differ"


def test_demo_scene_renders_sharded_end_to_end():
    """The full App demo scene (terrain + 2 polygon surfaces, orbit
    camera) rendered through the public API on an 8-row mesh matches
    the single-device pallas render with EXACT per-pixel winner
    equality (Renderer.debug_winner exposes the decision surface), and
    the framebuffer stays sharded."""
    from myrenderer_tpu.app.demo import DemoApp

    mesh = make_mesh(8, rows=8, tris=1)
    sharded = DemoApp(width=64, height=64, backend="pallas", mesh=mesh)
    single = DemoApp(width=64, height=64, backend="pallas")
    sharded.renderer.debug_winner = True
    single.renderer.debug_winner = True
    fb_s = sharded.run(2)
    fb_1 = single.run(2)
    # the decision surface is exact: same winning triangle everywhere
    win_s = [np.asarray(w) for w in sharded.draw.last_winners]
    win_1 = [np.asarray(w) for w in single.draw.last_winners]
    assert len(win_s) == len(win_1) >= 1
    for ws, w1 in zip(win_s, win_1):
        np.testing.assert_array_equal(ws, w1)
    # shaded RGBA may differ by ~1 ulp between the two compiled
    # programs on covered pixels (FMA contraction choices)
    assert (np.abs(fb_s - fb_1) < 1e-2).all()
    devs = sharded.window.framebuffer.sharding.device_set
    assert len(devs) == 8, "frame must stay row-sharded across devices"


def test_mesh_requires_divisible_height():
    from myrenderer_tpu.app.demo import DemoApp

    mesh = make_mesh(8, rows=8, tris=1)
    app = DemoApp(width=64, height=60, backend="pallas", mesh=mesh)
    with pytest.raises(ValueError, match="not divisible"):
        app.tick()


def test_framebuffer_is_sharded():
    mesh = make_mesh(8, rows=8, tris=1)
    H, W = 128, 128
    step = sharded_render_step(mesh, H, W)
    clip, vary = random_triangles(8, seed=5)
    out = step(clip, vary, jnp.ones(8, bool),
               jnp.zeros((H, W, 4), jnp.float32))
    # output stays sharded across devices (no implicit gather)
    shards = out.sharding.device_set
    assert len(shards) == 8


def test_pre_kernel_stage_actually_partitions():
    """Parity-independent evidence that the triangle-sharded vertex/
    setup/pack constraints (renderer/draw.py _batch_vertex_products /
    _setup_batch) BIND in the compiled SPMD program — XLA deciding to
    replicate the whole pre-kernel stage would pass every winner-parity
    test while silently killing the SURVEY §5.8 scaling claim. Asserts,
    from the compiled HLO of the mesh frame program:

    1. the packed coefficient rows are produced PARTITIONED (an
       f32[~T/8, 32] pack exists on each device), and
    2. they replicate at exactly the raster pin (an all-gather whose
       result is the full-T f32[T, 32] block, emitted for the
       sharding_constraint in _raster_packed).
    """
    import re

    from myrenderer_tpu.app.demo import DemoApp

    mesh = make_mesh(8, rows=8, tris=1)
    app = DemoApp(width=64, height=64, backend="pallas", mesh=mesh)
    app.tick()
    draw = app.draw
    plan = draw._get_plan(app.window)
    args = draw._gather_args(plan, app.window)
    txt = plan.fn.lower(args).compile().as_text()

    # terrain batch: 100x100 quads x 2 tris (the dominant pack block)
    t_main = 20000
    row_shapes = {int(m.group(1))
                  for m in re.finditer(r"f32\[(\d+),32\]", txt)}
    part = [n for n in row_shapes
            if abs(n - t_main // 8) <= 64]          # per-device pack
    assert part, (
        f"no partitioned f32[~{t_main // 8},32] pack found; the "
        f"pre-kernel stage compiled replicated (shapes: "
        f"{sorted(row_shapes)})")

    pin = [l for l in txt.splitlines()
           if "all-gather" in l
           and re.search(r"= f32\[(\d+),32\]", l)
           and int(re.search(r"= f32\[(\d+),32\]", l).group(1))
           >= t_main
           and "sharding_constraint" in l]
    assert pin, ("no full-T packed-row all-gather at the raster "
                 "sharding pin found in the compiled program")


def test_band_binning_is_band_local():
    """A band's stream/big live entries must exclude out-of-band
    triangles: without the bin_packed band cull, the tile-grid clamps
    turn every out-of-band triangle into live border-tile entries and
    each device's sort/gather/kernel work stays O(T) regardless of its
    band (round-4 VERDICT weak #2 — the §5.8 'binned to chips' half).
    Checks the actual per-entry triangle ids, not just counts."""
    from test_raster_pallas import CFG

    from myrenderer_tpu.ops import raster_pallas as rp

    H, W, bands = 64, 128, 4
    band = H // bands
    T = 60
    clip, vary = random_triangles(T, seed=11)
    valid = jnp.ones(T, bool)
    tc = rc.triangle_setup(clip, vary, valid, W, H, "back")
    packed = rc.pack_coeffs_full(tc)
    bbox = rp.viewport_bbox(clip, W, H)
    minv, maxv = np.asarray(bbox[2]), np.asarray(bbox[3])
    setup_valid = np.asarray(tc.valid)

    excluded_somewhere = 0
    for g in range(bands):
        y0 = g * band
        stream, starts, counts, big_rows, big_count, _touch, ovf = \
            jax.jit(rp.bin_packed, static_argnums=(3, 4, 5, 7))(
                packed, tc.valid, bbox, band, W, CFG, jnp.int32(y0), H)
        assert not np.asarray(ovf).any()
        in_band = setup_valid & (maxv >= y0) & (minv < y0 + band)
        # every live stream entry's id lane names an in-band triangle
        starts, counts = np.asarray(starts), np.asarray(counts)
        stream = np.asarray(stream)
        live_ids = set()
        for s, c in zip(starts, counts):
            live_ids.update(stream[s:s + c, 16].astype(int).tolist())
        nbig = int(np.asarray(big_count)[0])
        live_ids.update(np.asarray(big_rows)[0, :nbig, 16]
                        .astype(int).tolist())
        assert live_ids, f"band {g} unexpectedly empty"
        out_of_band = live_ids - set(np.nonzero(in_band)[0].tolist())
        assert not out_of_band, (
            f"band {g} carries out-of-band triangles {out_of_band}")
        excluded_somewhere += int((~in_band & setup_valid).sum())
    # the scene actually exercises the cull (random triangles spread
    # over 4 bands: many triangles miss at least one band, so the sum
    # of per-band exclusions is a healthy fraction of T x bands)
    assert excluded_somewhere > T // 2


def test_fragment_ctx_through_sharded_path():
    """A ctx-consuming fragment program (per-pixel texture sampling)
    renders through the multi-chip row-sharded path bit-identically on
    the decision surface vs single-device: the ctx's binding arrays are
    closed over inside the shard_map body (captured replicated)."""
    from myrenderer_tpu import (Binding, BindingLayout, Core, Draw,
                                Instance, Pipeline, Renderer, Surface,
                                VertexBuffer, VertexLayout, math3d)
    from myrenderer_tpu.ops.sampling import sample_nearest
    from myrenderer_tpu.renderer.pipeline import (BUILTIN_TRANSFORM,
                                                  TEXTURE_VIEW)

    tex = np.zeros((4, 4, 4), np.float32)
    for y in range(4):
        for x in range(4):
            tex[y, x] = ([1, 0, 0, 1] if (x + y) % 2 == 0
                         else [0, 1, 0, 1])

    def build(mesh):
        core = Core(fixed_timestep=1.0 / 60.0)
        window = core.create_window(64, 64, "t")
        rend = Renderer(core, raster_backend="pallas", mesh=mesh)
        rend.adopt_window(window)
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
        vb = VertexBuffer.new(rend, 0, 2, layout)
        vb.write_vertices(np.array([
            [0.1, 0.1, 0, 0], [0.9, 0.1, 1, 0], [0.1, 0.9, 0, 1],
            [0.9, 0.1, 1, 0], [0.9, 0.9, 1, 1], [0.1, 0.9, 0, 1]],
            np.float32))
        node = Instance.create_node(
            rend, pipeline=pipe, bindings=[Binding(1, attachment=tex)],
            bounding_box_p0=(0, 0, 0), bounding_box_p1=(1, 1, 2))
        node.get_backing().set_vertex_buffer(vb)
        surf = Surface.create_window_scene(rend, window, node)
        surf.set_perspective(math3d.projection_2d(
            left=0.0, right=1.0, bottom=1.0, top=0.0, near=0.1, far=2.0))
        rend.debug_winner = True
        draw = Draw.create(rend)
        draw.begin()
        draw.clear((0, 0, 1, 1))
        draw.draw_surface(surf)
        fb = np.asarray(draw.end())
        return fb, [np.asarray(w) for w in draw.last_winners]

    fb_s, win_s = build(make_mesh(8, rows=8, tris=1))
    fb_1, win_1 = build(None)
    for ws, w1 in zip(win_s, win_1):
        np.testing.assert_array_equal(ws, w1)
    assert (np.abs(fb_s - fb_1) < 1e-2).all()
    # the checker actually landed per-pixel
    assert fb_s[int(0.22 * 64), int(0.22 * 64), 0] > 0.9
