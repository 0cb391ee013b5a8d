"""Pallas rasterizer vs oracle: bit-exact parity (interpret mode on CPU).

The two backends share raster_common's decision math, so every
*decision* — coverage and depth ordering, i.e. the per-pixel winning
triangle — must be bit-identical for scenes without bin overflow
(BASELINE.md "bit-stable depth ordering"). Raw depth *values* may differ
by 1 ulp between the two compiled programs (FMA contraction is a
backend codegen choice), so depth buffers are compared to 2 ulp.
"""


def assert_depth_close(d_ref, d_pal):
    a, b = np.asarray(d_ref), np.asarray(d_pal)
    ulps = np.abs(a.view(np.int32) - b.view(np.int32))
    assert ulps.max() <= 2, f"depth differs by {ulps.max()} ulps"

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myrenderer_tpu.ops import raster_common as rc
from myrenderer_tpu.ops import raster_pallas as rp
from myrenderer_tpu.ops import raster_ref as rr

CFG = rp.RasterConfig(tile_h=8, tile_w=128, max_tiles_per_tri=8,
                      big_capacity=256, stream_window=64, interpret=True)


def random_triangles(n, seed, depth_range=(0.1, 0.9), w_range=(0.8, 5.0)):
    """Random CW screen-space triangles lifted to clip space."""
    rng = np.random.default_rng(seed)
    ndc = rng.uniform(-1.2, 1.2, (n, 3, 2)).astype(np.float32)
    z = rng.uniform(*depth_range, (n, 3)).astype(np.float32)
    w = rng.uniform(*w_range, (n, 3)).astype(np.float32)
    # ensure CW winding in y-down screen space (positive pixel-space area)
    d1 = ndc[:, 1] - ndc[:, 0]
    d2 = ndc[:, 2] - ndc[:, 0]
    # y-down: flip sign of y when computing screen-space cross
    cross = d1[:, 0] * (-d2[:, 1]) - (-d1[:, 1]) * d2[:, 0]
    flip = cross < 0
    ndc[flip] = ndc[flip][:, ::-1]
    clip = np.concatenate([
        ndc * w[..., None], (z * w)[..., None], w[..., None]], axis=-1)
    vary = rng.uniform(0, 1, (n, 3, 4)).astype(np.float32)
    return jnp.asarray(clip), jnp.asarray(vary)


@pytest.mark.parametrize("n,seed", [(1, 0), (7, 1), (40, 2), (200, 3)])
def test_visibility_parity(n, seed):
    H, W = 48, 160
    clip, vary = random_triangles(n, seed)
    valid = jnp.ones(n, bool)
    tc = rc.triangle_setup(clip, vary, valid, W, H, "back")

    d_ref, w_ref = rr.rasterize_visibility(tc, H, W)
    d_pal, w_pal, ovf = rp.rasterize_visibility(
        tc, H, W, tri_clip=clip, cfg=CFG, return_overflow=True)
    assert not bool(ovf), "test scene must not overflow bins"
    np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w_pal))
    assert_depth_close(d_ref, d_pal)


def test_parity_with_carried_depth():
    """Second batch rasterized against the first batch's depth."""
    H, W = 40, 130   # non-multiples of tile size: exercises padding
    clip1, vary1 = random_triangles(20, 10)
    clip2, vary2 = random_triangles(20, 11)
    v = jnp.ones(20, bool)
    tc1 = rc.triangle_setup(clip1, vary1, v, W, H, "back")
    tc2 = rc.triangle_setup(clip2, vary2, v, W, H, "back")

    d1r, _ = rr.rasterize_visibility(tc1, H, W)
    d2r, w2r = rr.rasterize_visibility(tc2, H, W, depth=d1r)

    d1p, _ = rp.rasterize_visibility(tc1, H, W, tri_clip=clip1, cfg=CFG)
    d2p, w2p = rp.rasterize_visibility(tc2, H, W, depth=d1p,
                                       tri_clip=clip2, cfg=CFG)
    np.testing.assert_array_equal(np.asarray(w2r), np.asarray(w2p))
    assert_depth_close(d2r, d2p)


def test_big_triangle_path():
    """A full-frame triangle exceeds max_tiles_per_tri and must flow
    through the big list, still matching the oracle."""
    H, W = 32, 256
    big = jnp.asarray(np.array([[[-3.0, 3.0, 0.25, 1.0],
                                 [3.0, 3.0, 0.25, 1.0],
                                 [-3.0, -3.0, 0.25, 1.0]]], np.float32))
    small, svary = random_triangles(10, 5, depth_range=(0.05, 0.2))
    clip = jnp.concatenate([big, small])
    vary = jnp.concatenate([jnp.ones((1, 3, 4), jnp.float32), svary])
    valid = jnp.ones(clip.shape[0], bool)
    tc = rc.triangle_setup(clip, vary, valid, W, H, "back")

    d_ref, w_ref = rr.rasterize_visibility(tc, H, W)
    d_pal, w_pal, ovf = rp.rasterize_visibility(
        tc, H, W, tri_clip=clip, cfg=CFG, return_overflow=True)
    assert not bool(ovf)
    # big triangle covers everything at z=0.25; smaller-z tris in front.
    # no exact depth ties across big/small -> identical output required.
    np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w_pal))
    assert_depth_close(d_ref, d_pal)


def test_band_rendering_matches_full_frame():
    """Band mode (y0/vp_height — the multi-chip row-shard path) must be
    bit-identical to the same rows of a full-frame render: per-tile bin
    contents and pixel coordinates are unchanged."""
    H, W = 64, 128
    clip, vary = random_triangles(50, seed=12)
    valid = jnp.ones(50, bool)
    tc = rc.triangle_setup(clip, vary, valid, W, H, "back")

    d_full, w_full = rp.rasterize_visibility(tc, H, W, tri_clip=clip,
                                             cfg=CFG)
    band = 16
    d_rows, w_rows = [], []
    for y0 in range(0, H, band):
        d, w, _n, _dn, _o = rp.rasterize(
            tc, band, W, tri_clip=clip, cfg=CFG, y0=jnp.int32(y0),
            vp_height=H)
        d_rows.append(np.asarray(d))
        w_rows.append(np.asarray(w))
    np.testing.assert_array_equal(np.concatenate(w_rows),
                                  np.asarray(w_full))
    np.testing.assert_array_equal(np.concatenate(d_rows),
                                  np.asarray(d_full))


def test_overflow_reported():
    """Big-list overflow (the only remaining capacity: CSR bins are
    exact) must be reported."""
    H, W = 16, 128
    cfg = rp.RasterConfig(tile_h=8, tile_w=128, max_tiles_per_tri=1,
                          big_capacity=16, chunk=16, interpret=True)
    clip, vary = random_triangles(64, 7)   # most span > 1 tile -> big
    valid = jnp.ones(64, bool)
    tc = rc.triangle_setup(clip, vary, valid, W, H, "back")
    _, _, ovf = rp.rasterize_visibility(tc, H, W, tri_clip=clip, cfg=cfg,
                                        return_overflow=True)
    assert bool(ovf)


def test_demo_scene_backend_parity():
    """Full App demo frame: pallas(interpret) vs oracle. Coverage and
    depth-ordering decisions are identical; interpolated color values
    may differ by ~1 ulp (the fused kernel and the oracle's shade pass
    evaluate the same planes in different compiled programs)."""
    from myrenderer_tpu.app.demo import DemoApp
    fb_o = np.asarray(DemoApp(width=128, height=128,
                              backend="oracle").run(2))
    fb_p = np.asarray(DemoApp(width=128, height=128,
                              backend="pallas").run(2))
    # same covered pixels
    np.testing.assert_array_equal(fb_o[..., 3] > 0, fb_p[..., 3] > 0)
    np.testing.assert_allclose(fb_o, fb_p, atol=5e-4, rtol=1e-4)


def test_hierarchical_instances_backend_parity():
    """BASELINE config[2]: N instanced meshes with hierarchical
    transforms — same image from both backends."""
    import sys
    sys.path.insert(0, ".")
    from test_render_e2e import (flat_pipeline, make_renderer, ortho_unit,
                                 render_frame, triangle_node)
    from myrenderer_tpu import SceneNode, math3d

    def build(backend):
        rend, window = make_renderer(96, 128, backend=backend)
        pipe, layout = flat_pipeline(rend)
        root = SceneNode.create(rend)
        root.set_xform(math3d.translate([0.05, 0.05, 0.0]))
        colors = [(1, 0, 0), (0, 1, 0), (1, 1, 0), (0, 1, 1)]
        group = root
        for i in range(4):  # chain: each level offsets further
            child = SceneNode.create(rend)
            child.set_xform(math3d.translate([0.18, 0.12, 0.0]))
            tri = triangle_node(rend, pipe, layout,
                                [(0.0, 0.0), (0.22, 0.0), (0.0, 0.22)],
                                color=colors[i])
            child.add_child(tri)
            group.add_child(child)
            group = child
        surf = Surface.create_window_scene(rend, window, root)
        surf.set_perspective(ortho_unit())
        return render_frame(rend, [surf], clear=(0, 0, 0, 1))

    from myrenderer_tpu.renderer.surface import Surface
    fb_o = build("oracle")
    fb_p = build("pallas")
    # coverage identical; colors to float tolerance
    np.testing.assert_array_equal(fb_o[..., 3] > 0.5, fb_p[..., 3] > 0.5)
    np.testing.assert_allclose(fb_o, fb_p, atol=5e-4)
    # all four chain levels visible
    found = {tuple(np.round(c, 2)) for c in
             fb_o[fb_o[..., 3] > 0.5].reshape(-1, 4)[:, :3].tolist()}
    assert len(found) >= 4


def test_wide_pack_matches_narrow():
    """pack_coeffs_full(lanes=128) (the frame program's pad-free wide
    pack) must rasterize bit-identically to the narrow [T, 32] pack +
    internal pad — the pad lanes are zeros the kernel never reads."""
    H, W = 48, 256
    clip, vary = random_triangles(120, seed=33)
    valid = jnp.ones(120, bool)
    tc = rc.triangle_setup(clip, vary, valid, W, H, "back")
    bbox = rp.viewport_bbox(clip, W, H)
    outs = []
    for lanes in (rc.FULL_LANES, 128):
        packed = rc.pack_coeffs_full(tc, lanes=lanes)
        assert packed.shape[1] == lanes
        outs.append(rp.rasterize_packed(packed, tc.valid, bbox, H, W,
                                        cfg=CFG))
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stream_window_boundaries():
    """The coefficient-row stream is DMAed in fixed windows; tile
    segments that straddle window boundaries (start/end at arbitrary
    offsets) must evaluate identically for every window size."""
    H, W = 48, 256
    clip, vary = random_triangles(150, seed=21)
    valid = jnp.ones(150, bool)
    tc = rc.triangle_setup(clip, vary, valid, W, H, "back")
    d_ref, w_ref = rr.rasterize_visibility(tc, H, W)
    for win in (32, 64, 512):
        cfg = rp.RasterConfig(tile_h=8, tile_w=128, big_capacity=256,
                              stream_window=win, chunk=16,
                              interpret=True)
        d, w = rp.rasterize_visibility(tc, H, W, tri_clip=clip, cfg=cfg)
        np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w))
        assert_depth_close(d_ref, d)


def test_perspective_correct_interpolation():
    """A triangle with a large depth gradient: varyings must interpolate
    perspective-correctly (attr/w linear in screen space), not
    screen-linearly. Verified against the analytic value at the pixel
    center, on both backends. (SURVEY §7: the demo's flat colors can't
    catch this.)"""
    H, W = 64, 128
    # vertices: near-left (w=1), far-right (w=10): red->green gradient
    #   v0 at NDC (-0.9, 0),  w=1,  color (1,0,0,1)
    #   v1 at NDC ( 0.9, 0.9), w=10, color (0,1,0,1)
    #   v2 at NDC (-0.9, -0.9), w=1, color (1,0,0,1)  (CW in y-down)
    def cv(x, y, z, w, c):
        return [x * w, y * w, z * w, w], c
    verts = [cv(-0.9, 0.9, 0.5, 1.0, (1, 0, 0, 1)),
             cv(0.9, 0.9, 0.5, 10.0, (0, 1, 0, 1)),
             cv(-0.9, -0.9, 0.5, 1.0, (1, 0, 0, 1))]
    clip = jnp.asarray([[v[0] for v in verts]], jnp.float32)
    vary = jnp.asarray([[v[1] for v in verts]], jnp.float32)
    valid = jnp.ones(1, bool)
    tc = rc.triangle_setup(clip, vary, valid, W, H, "back")

    d, w_ref = rr.rasterize_visibility(tc, H, W)
    px, py = rc.pixel_grids(H, W)
    varp, _cov = rc.resolve_varyings(tc, jnp.maximum(w_ref, 0), px, py)
    varp = np.asarray(varp)
    covered = np.asarray(w_ref) >= 0
    assert covered.any()

    # analytic check at a covered pixel: beta = screen barycentric from
    # NDC positions; correct = sum(beta*c/w) / sum(beta/w)
    ys, xs = np.nonzero(covered)
    mid = len(ys) // 2
    y, x = int(ys[mid]), int(xs[mid])
    pxc, pyc = x + 0.5, y + 0.5
    ndc = np.array([[(v[0][0] / v[0][3]), (v[0][1] / v[0][3])]
                    for v in verts])
    scr = np.stack([(ndc[:, 0] * 0.5 + 0.5) * W,
                    (0.5 - ndc[:, 1] * 0.5) * H], axis=1)
    T_mat = np.array([[scr[0, 0] - scr[2, 0], scr[1, 0] - scr[2, 0]],
                      [scr[0, 1] - scr[2, 1], scr[1, 1] - scr[2, 1]]])
    b01 = np.linalg.solve(T_mat, np.array([pxc - scr[2, 0],
                                           pyc - scr[2, 1]]))
    beta = np.array([b01[0], b01[1], 1 - b01.sum()])
    ws = np.array([1.0, 10.0, 1.0])
    cols = np.array([v[1] for v in verts], np.float64)
    expect = (beta / ws) @ cols / (beta / ws).sum()
    np.testing.assert_allclose(varp[y, x], expect, atol=1e-3)

    # screen-linear interpolation would differ substantially here
    linear = beta @ cols
    assert abs(linear[1] - expect[1]) > 0.05, \
        "test scene too weak to distinguish perspective correctness"

    # pallas path agrees
    d2, w2, num, den, _ = rp.rasterize(tc, H, W, tri_clip=clip, cfg=CFG)
    varp_p = np.asarray(num)[:, y, x] / np.asarray(den)[y, x]
    np.testing.assert_allclose(varp_p, expect, atol=1e-3)


def test_exact_depth_tie_first_submitted_wins():
    """Two coplanar overlapping triangles at the same z: the 'less'
    depth test keeps the FIRST submitted (Pipeline.zig:150-154), on both
    backends."""
    H, W = 32, 128
    tri = np.array([[[-0.8, 0.8, 0.5, 1.0],
                     [0.8, 0.8, 0.5, 1.0],
                     [-0.8, -0.8, 0.5, 1.0]]], np.float32)
    clip = jnp.asarray(np.concatenate([tri, tri]))   # identical geometry
    vary = jnp.asarray(np.stack([
        np.full((3, 4), [1, 0, 0, 1], np.float32),   # first: red
        np.full((3, 4), [0, 1, 0, 1], np.float32),   # second: green
    ]))
    valid = jnp.ones(2, bool)
    tc = rc.triangle_setup(clip, vary, valid, W, H, "back")

    d_r, w_r = rr.rasterize_visibility(tc, H, W)
    assert (np.asarray(w_r)[np.asarray(w_r) >= 0] == 0).all(), \
        "oracle: first submitted must win exact ties"
    d_p, w_p = rp.rasterize_visibility(tc, H, W, tri_clip=clip, cfg=CFG)
    np.testing.assert_array_equal(np.asarray(w_r), np.asarray(w_p))


def test_fused_key_vs_two_key_sort_paths():
    """The fused single-key bin sort (i32/u32) and the variadic two-key
    fallback must produce identical CSR structures and streams — the
    fallback only triggers at huge (tile count x triangle count) spaces
    on real frames, so pin the equivalence explicitly at a size where
    both paths can run."""
    import dataclasses

    H, W = 64, 256
    n = 300
    clip, vary = random_triangles(n, 7)
    valid = jnp.ones(n, bool)
    tc = rc.triangle_setup(clip, vary, valid, W, H, "back")

    outs = {}
    for force_fallback in (False, True):
        if force_fallback:
            # shrink the apparent key space by monkeypatching the
            # threshold via a tiny config wrapper: easiest is to call
            # with a huge virtual tile count — instead, recompute with
            # the module's fallback branch by patching the constant
            import unittest.mock as mock
            with mock.patch.object(rp, "_FORCE_TWO_KEY_SORT", True,
                                   create=True):
                outs[True] = rp.bin_triangles(tc, clip, H, W, CFG)
        else:
            outs[False] = rp.bin_triangles(tc, clip, H, W, CFG)

    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_row_group_split_matches_single_group():
    """Split-frame binning (row groups, each with its own u32-fitting
    fused key space and stream segment) must render identically to the
    single-group path. Real frames only split at huge NT x T (e.g.
    8-row tiles at 4K with a megatriangle batch); force the group count
    here so tests pin the multi-group path at small scale."""
    import unittest.mock as mock

    H, W = 64, 256
    clip, vary = random_triangles(120, seed=31)
    valid = jnp.ones(120, bool)
    tc = rc.triangle_setup(clip, vary, valid, W, H, "back")

    d1, w1, n1, e1, o1 = rp.rasterize(tc, H, W, tri_clip=clip, cfg=CFG)
    assert not bool(np.asarray(o1).any())
    for groups in (2, 3, 8):
        with mock.patch.object(rp, "_FORCE_ROW_GROUPS", groups,
                               create=True):
            d, w, n, e, o = rp.rasterize(tc, H, W, tri_clip=clip,
                                         cfg=CFG)
        assert not bool(np.asarray(o).any())
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d))
        np.testing.assert_array_equal(np.asarray(n1), np.asarray(n))


def test_big_vs_binned_exact_tie_lowest_id_wins():
    """A big-list triangle (span > K) tying EXACTLY in depth with a
    later-submitted binned triangle: the depth resolve's id tie-break
    must keep the first-submitted (lowest id) even though the kernel
    evaluates big-list entries after binned ones — submission-order
    'less' semantics (Pipeline.zig:150-154), now exact for ties across
    routing classes too."""
    H, W = 128, 128   # nty=16 at tile_h=8 -> full-frame span 16 > K=8
    big = np.array([[[-3.0, 3.0, 0.5, 1.0],
                     [3.0, 3.0, 0.5, 1.0],
                     [-3.0, -3.0, 0.5, 1.0]]], np.float32)
    small = np.array([[[-0.5, 0.5, 0.25, 0.5],
                       [0.5, 0.5, 0.25, 0.5],
                       [-0.5, -0.5, 0.25, 0.5]]], np.float32)
    # both planes are z_ndc = 0.5 exactly (z = 0.5*w per vertex)
    clip = jnp.asarray(np.concatenate([big, small]))
    vary = jnp.asarray(np.stack([
        np.full((3, 4), [1, 0, 0, 1], np.float32),
        np.full((3, 4), [0, 1, 0, 1], np.float32)]))
    valid = jnp.ones(2, bool)
    tc = rc.triangle_setup(clip, vary, valid, W, H, "back")

    d_r, w_r = rr.rasterize_visibility(tc, H, W)
    wr = np.asarray(w_r)
    assert (wr[wr >= 0] == 0).all(), \
        "oracle: the first-submitted triangle wins the exact tie"
    d_p, w_p, ovf = rp.rasterize_visibility(
        tc, H, W, tri_clip=clip, cfg=CFG, return_overflow=True)
    assert not bool(ovf)
    np.testing.assert_array_equal(wr, np.asarray(w_p))
    assert_depth_close(d_r, d_p)


def test_span_budget_scales_with_resolution():
    """auto_span: the span budget grows with the tile grid (sqrt) and is
    capped by the candidate budget at megatriangle counts, so large
    frames route triangles through CSR bins instead of degenerating to
    the shared big list (the 8K cliff, BASELINE.md)."""
    base = rp.RasterConfig()
    # demo-scale grids keep the configured budget
    assert rp._span_budget(20_000, 510, base) == 8
    # 8K-scale grid (NT ~8100 at 32-row tiles): budget grows ~4x
    assert rp._span_budget(20_000, 8100, base) == 32
    # megatriangle batch: candidate budget caps it back to the floor
    assert rp._span_budget(1_012_784, 8100, base) == 8
    # auto_span off pins the configured value
    pinned = rp.RasterConfig(auto_span=False)
    assert rp._span_budget(20_000, 8100, pinned) == 8

    # integration: a sliver spanning ~11 tiles at a 1024-tile grid is
    # BINNED under auto_span (budget grows to 12) and big without it
    H, W = 1024, 1024
    tri = np.array([[[-0.95, 0.90, 0.5, 1.0],
                     [-0.93, 0.90, 0.5, 1.0],
                     [-0.95, 0.74, 0.5, 1.0]]], np.float32)
    clip = jnp.asarray(tri)
    vary = jnp.ones((1, 3, 4), jnp.float32)
    tc = rc.triangle_setup(clip, vary, jnp.ones(1, bool), W, H, "back")
    cfg_auto = rp.RasterConfig(tile_h=8, tile_w=128, interpret=True)
    cfg_pin = rp.RasterConfig(tile_h=8, tile_w=128, auto_span=False,
                              interpret=True)
    assert rp._span_budget(1, 1024, cfg_auto) >= 11
    assert int(np.asarray(
        rp.bin_triangles(tc, clip, H, W, cfg_auto)[4])[0]) == 0
    assert int(np.asarray(
        rp.bin_triangles(tc, clip, H, W, cfg_pin)[4])[0]) == 1


def test_banded_kernel_matches_single_band():
    """bands>1 (several fine y-tiles per kernel program, fori-looped)
    must render identically to bands=1, including when the fine-tile
    count does not divide the band count (grid padding)."""
    import dataclasses

    for H, W in ((48, 160), (64, 128)):   # 6 and 8 fine rows at tile_h=8
        clip, vary = random_triangles(80, seed=41)
        valid = jnp.ones(80, bool)
        tc = rc.triangle_setup(clip, vary, valid, W, H, "back")
        d1, w1, n1, e1, o1 = rp.rasterize(tc, H, W, tri_clip=clip,
                                          cfg=CFG)
        for bd in (2, 4):
            cfg = dataclasses.replace(CFG, bands=bd)
            d, w, n, e, o = rp.rasterize(tc, H, W, tri_clip=clip,
                                         cfg=cfg)
            np.testing.assert_array_equal(np.asarray(w1), np.asarray(w))
            np.testing.assert_array_equal(np.asarray(d1), np.asarray(d))
            np.testing.assert_array_equal(np.asarray(n1), np.asarray(n))


def test_config_from_flag_slots():
    """The apps' shared --raster flag: positional slots bind in order,
    0 keeps the RasterConfig default in optional slots."""
    import pytest

    c = rp.config_from_flag("8,128,16,256")
    assert (c.tile_h, c.tile_w, c.chunk, c.stream_window) == \
        (8, 128, 16, 256)
    assert c.tiles_x == 1 and c.auto_span
    c = rp.config_from_flag("32,128,32,256,2,6,1,0,15")
    assert c.tiles_x == 2
    assert c.max_tiles_per_tri == 6 and not c.auto_span
    assert c.stream_factor == 1.5
    # zeros skip: span stays auto, sf stays default
    c = rp.config_from_flag("8,128,32,256,1,0,0,0,0")
    assert c.auto_span and c.stream_factor == 2.0 and c.bands == 1
    # pruned knobs (round 4): nonzero slots are rejected loudly
    with pytest.raises(ValueError, match="subtiles.*pruned"):
        rp.config_from_flag("8,128,32,256,1,0,0,4")
    with pytest.raises(ValueError, match="packed_stream.*pruned"):
        rp.config_from_flag("8,128,32,256,1,0,0,0,0,1")


def test_auto_config_mapping():
    """Resolution/occupancy-adaptive defaults reproduce the measured-
    best hand-pinned configs they replaced (BASELINE.md batches; the
    reference rasterizes at any window size with no knob,
    Surface.zig:76-94)."""
    DEMO_T = 20007
    STRESS_T = 708 * 708 * 2 + 10000

    c = rp.auto_config(1920, 1080, DEMO_T)        # 103 px/tri
    assert (c.tile_h, c.chunk, c.stream_window) == (16, 32, 128)
    c = rp.auto_config(3840, 2160, DEMO_T)        # 415 px/tri
    assert (c.tile_h, c.chunk) == (32, 32)
    c = rp.auto_config(7680, 4320, DEMO_T)        # 1659 px/tri
    assert c.tile_h >= 32 and c.chunk == 32
    c = rp.auto_config(3840, 2160, STRESS_T)      # 8.2 px/tri
    assert (c.tile_h, c.chunk, c.stream_window) == (8, 64, 128)
    assert c.stream_factor == 1.6
    # tiny probe windows with dense scenes hit the megatriangle branch
    c = rp.auto_config(64, 64, DEMO_T)
    assert c.tile_h == 8
    # unknown triangle count: demo-class fallback, never megatriangle
    c = rp.auto_config(1920, 1080, None)
    assert c.tile_h >= 16 and c.stream_factor == 2.0


def test_auto_config_is_the_planner_default():
    """With no explicit Renderer.raster_cfg the frame plan carries the
    auto-selected config (and an explicit config still wins)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_render_e2e import (flat_pipeline, make_renderer,
                                 ortho_unit, render_frame, triangle_node)

    from myrenderer_tpu import Draw, Surface

    rend, window = make_renderer(64, 64, backend="pallas")
    pipe, layout = flat_pipeline(rend)
    node = triangle_node(rend, pipe, layout,
                         [(0.1, 0.1), (0.9, 0.1), (0.1, 0.9)])
    surf = Surface.create_window_scene(rend, window, node)
    surf.set_perspective(ortho_unit())
    render_frame(rend, [surf])
    draw = rend.draws[-1]
    plan = draw._get_plan(window)
    want = rp.auto_config(64, 64, 1)
    assert plan.raster_cfg.tile_h == want.tile_h
    assert plan.raster_cfg.chunk == want.chunk

    rend.raster_cfg = rp.RasterConfig(tile_h=8, chunk=8, interpret=True)
    rend.bump_scene_version()
    render_frame(rend, [surf])
    plan = draw._get_plan(window)
    assert (plan.raster_cfg.tile_h, plan.raster_cfg.chunk) == (8, 8)


def test_auto_config_reselects_on_resize():
    """auto_config is per-(resolution, occupancy): a window resize that
    crosses a px/tri threshold re-picks the tile size on the next plan
    (the reference renders at any window size with no knob,
    ``Surface.zig:76-94``; round 5)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_render_e2e import (flat_pipeline, make_renderer,
                                 ortho_unit, render_frame, triangle_node)

    from myrenderer_tpu import Surface

    rend, window = make_renderer(12, 16, backend="pallas")
    pipe, layout = flat_pipeline(rend)
    node = triangle_node(rend, pipe, layout,
                         [(0.1, 0.1), (0.9, 0.1), (0.1, 0.9)])
    surf = Surface.create_window_scene(rend, window, node)
    surf.set_perspective(ortho_unit())
    render_frame(rend, [surf])
    draw = rend.draws[-1]
    t_small = rp.auto_config(12, 16, 1).tile_h
    assert draw._get_plan(window).raster_cfg.tile_h == t_small == 16

    surf.resize((64, 64))                    # 192 -> 4096 px/tri
    render_frame(rend, [surf])
    t_big = rp.auto_config(64, 64, 1).tile_h
    assert draw._get_plan(window).raster_cfg.tile_h == t_big == 64
