"""Eye/near-plane clipping tests.

The reference's GPU clips triangles straddling the near plane in
fixed-function hardware (``Renderer/Pipeline.zig:137-161``); the rebuild
clips explicitly in the setup stage (``raster_common.clip_near_capacity``)
— only for triangles with a vertex at w <= W_EPS (the clipless 2DH
method needs no clipping for all-in-front geometry).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myrenderer_tpu.ops import raster_common as rc
from myrenderer_tpu.ops import raster_pallas as rp
from myrenderer_tpu.ops import raster_ref as rr


def straddler(zfrac=0.5):
    """One triangle with a vertex behind the eye whose visible part is
    front-facing (CW in y-down pixel space)."""
    clip = np.array([[[-0.8, -0.5, zfrac, 1.0],
                      [0.0, 2.0, -zfrac, -1.0],
                      [0.8, -0.5, zfrac, 1.0]]], np.float32)
    vary = np.zeros((1, 3, 4), np.float32)
    vary[0] = [[1, 0, 0, 1], [0, 1, 0, 1], [0, 0, 1, 1]]
    return jnp.asarray(clip), jnp.asarray(vary)


def test_clip_one_inside_vertex_geometry():
    """n_in == 1: hand-checked Sutherland-Hodgman output."""
    clip = jnp.asarray(np.array([[[0.0, 0.0, 0.5, 1.0],
                                  [1.0, 0.0, 0.5, -1.0],
                                  [-1.0, 0.0, 0.5, -3.0]]], np.float32))
    vary = jnp.asarray(np.tile(np.eye(3, 4, dtype=np.float32)[None],
                               (1, 1, 1)))
    t1c, t1v, t2c, t2v, v1, v2 = rc._clip_straddlers(clip, vary)
    assert bool(v1[0]) and not bool(v2[0])
    t1c = np.asarray(t1c[0])
    # vertex 0 kept verbatim
    np.testing.assert_allclose(t1c[0], [0.0, 0.0, 0.5, 1.0])
    # both intersections land on w = W_CLIP up to f32 lerp roundoff
    # (absolute error ~ eps * |w_j - w_i|), and the margin over W_EPS
    # guarantees they pass triangle_setup's w_ok
    np.testing.assert_allclose(t1c[1:, 3], rc.W_CLIP, atol=5e-7)
    assert (t1c[1:, 3] > rc.W_EPS).all()
    # edge (v0, v1): t = (W_CLIP - 1) / (-1 - 1)
    t01 = (rc.W_CLIP - 1.0) / (-2.0)
    np.testing.assert_allclose(t1c[1, 0], t01, rtol=1e-5)
    # edge (v2, v0): t = (W_CLIP + 3) / (1 + 3), x = -1 + 4t*(0-(-1))/4
    t20 = (rc.W_CLIP + 3.0) / 4.0
    np.testing.assert_allclose(t1c[2, 0], -1.0 + t20, rtol=1e-5)
    # varyings lerped with the same t
    t1v = np.asarray(t1v[0])
    np.testing.assert_allclose(t1v[1, 0], 1.0 - t01, rtol=1e-5)
    np.testing.assert_allclose(t1v[1, 1], t01, rtol=1e-5)


def test_clip_two_inside_vertices_quad():
    """n_in == 2 produces a quad fan of two valid triangles whose
    kept vertices are the original inside ones."""
    clip = jnp.asarray(np.array([[[0.0, 0.0, 0.5, -1.0],
                                  [1.0, 0.0, 0.5, 2.0],
                                  [-1.0, 0.0, 0.5, 3.0]]], np.float32))
    vary = jnp.zeros((1, 3, 4), jnp.float32)
    t1c, _t1v, t2c, _t2v, v1, v2 = rc._clip_straddlers(clip, vary)
    assert bool(v1[0]) and bool(v2[0])
    t1c, t2c = np.asarray(t1c[0]), np.asarray(t2c[0])
    np.testing.assert_allclose(t1c[1], [1.0, 0.0, 0.5, 2.0])   # v1 kept
    np.testing.assert_allclose(t1c[2], [-1.0, 0.0, 0.5, 3.0])  # v2 kept
    np.testing.assert_allclose(t2c[1], [-1.0, 0.0, 0.5, 3.0])
    # shared fan vertices: tri2 = [I01, v2, I20]
    np.testing.assert_allclose(t1c[0], t2c[0])
    np.testing.assert_allclose([t1c[0, 3], t2c[2, 3]], rc.W_CLIP,
                               atol=5e-7)


def test_clipped_triangles_keep_facing():
    """Winding is preserved: the clipped pieces of a CW front-facing
    straddler pass triangle_setup's facing test (are not back-culled)."""
    clip, vary = straddler()
    oc, ov, valid, _zb, _cc, ovf = rc.clip_near_capacity(
        clip, vary, jnp.ones(1, bool), cap=4)
    assert not bool(ovf)
    tc = rc.triangle_setup(oc, ov, valid, 64, 64, "back")
    v = np.asarray(tc.valid)
    assert not v[0], "the straddler itself must still be dropped"
    assert v[1:].sum() == 2, "both clipped pieces must survive facing/w"


def test_clip_matches_manual_preclip_coverage():
    """Rendering through the clip stage covers the same pixels as
    rendering analytically pre-clipped geometry directly (the
    fixed-function behavior). Edge pixels may flip by 1 ulp between the
    two compiled programs; bound the mismatch."""
    H = W = 96
    clip, vary = straddler()
    oc, ov, valid, _zb, _cc, _ovf = rc.clip_near_capacity(
        clip, vary, jnp.ones(1, bool), cap=4)
    tc = rc.triangle_setup(oc, ov, valid, W, H, "back")
    _d, win = rr.rasterize_visibility(tc, H, W)
    got = np.asarray(win) >= 0

    # manual clip in float64 numpy (same plane, independent arithmetic)
    v = np.asarray(clip[0], np.float64)
    a = np.asarray(vary[0], np.float64)
    inside = v[:, 3] > rc.W_EPS
    assert inside.sum() == 2
    b = int(np.argmax(~inside))
    i0, i1, i2 = b, (b + 1) % 3, (b + 2) % 3

    def isect(i, j):
        t = (rc.W_CLIP - v[i, 3]) / (v[j, 3] - v[i, 3])
        return v[i] + t * (v[j] - v[i])

    q = [isect(i0, i1), v[i1], v[i2], isect(i2, i0)]
    man_clip = jnp.asarray(np.stack([[q[0], q[1], q[2]],
                                     [q[0], q[2], q[3]]]), jnp.float32)
    man_vary = jnp.zeros((2, 3, 4), jnp.float32)
    tcm = rc.triangle_setup(man_clip, man_vary, jnp.ones(2, bool), W, H,
                            "back")
    _dm, winm = rr.rasterize_visibility(tcm, H, W)
    want = np.asarray(winm) >= 0
    assert want.sum() > 100, "pre-clipped reference must cover pixels"
    mismatch = (got != want).mean()
    assert mismatch < 5e-3, f"coverage differs on {mismatch:.2%} pixels"


def test_clip_backend_parity():
    """Straddling scene: pallas (interpret) vs oracle, decision-exact on
    the identical clipped stream."""
    H, W = 48, 160
    from test_raster_pallas import CFG, random_triangles
    clip, vary = random_triangles(20, seed=9)
    sc, sv = straddler()
    clip = jnp.concatenate([clip[:10], sc, clip[10:]])
    vary = jnp.concatenate([vary[:10], sv, vary[10:]])
    oc, ov, valid, _zb, _cc, _ovf = rc.clip_near_capacity(
        clip, vary, jnp.ones(21, bool), cap=4)
    tc = rc.triangle_setup(oc, ov, valid, W, H, "back")
    d_ref, w_ref = rr.rasterize_visibility(tc, H, W)
    d_pal, w_pal = rp.rasterize_visibility(tc, H, W, tri_clip=oc, cfg=CFG)
    np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w_pal))


def test_no_straddlers_is_identity():
    """With no straddling triangles the appended slots are inert: same
    winners as the unclipped stream."""
    from test_raster_pallas import random_triangles
    H, W = 32, 128
    clip, vary = random_triangles(12, seed=4)
    valid = jnp.ones(12, bool)
    oc, ov, ovalid, _zb, _cc, ovf = rc.clip_near_capacity(clip, vary, valid,
                                                     cap=8)
    assert not bool(ovf)
    tc0 = rc.triangle_setup(clip, vary, valid, W, H, "back")
    tc1 = rc.triangle_setup(oc, ov, ovalid, W, H, "back")
    _d0, w0 = rr.rasterize_visibility(tc0, H, W)
    _d1, w1 = rr.rasterize_visibility(tc1, H, W)
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))


def test_clip_capacity_overflow_flag():
    many_c, many_v = straddler()
    many_c = jnp.tile(many_c, (9, 1, 1))
    many_v = jnp.tile(many_v, (9, 1, 1))
    _oc, _ov, _valid, _zb, _cc, ovf = rc.clip_near_capacity(
        many_c, many_v, jnp.ones(9, bool), cap=8)
    assert bool(ovf)
    _oc, _ov, _valid, _zb, _cc, ovf = rc.clip_near_capacity(
        many_c, many_v, jnp.ones(9, bool), cap=16)
    assert not bool(ovf)
