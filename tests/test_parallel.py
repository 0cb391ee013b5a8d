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


@pytest.mark.parametrize("rows,tris", [(8, 1), (4, 2), (2, 4)])
def test_sharded_matches_single_device(rows, tris):
    H, W = 16 * rows, 128
    T = 24  # divisible by all tris-axis sizes
    clip, vary = random_triangles(T, seed=3)
    valid = jnp.ones(T, bool)
    fb = jnp.zeros((H, W, 4), jnp.float32)

    mesh = make_mesh(8, rows=rows, tris=tris)
    step = sharded_render_step(mesh, H, W, return_winner=True)
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
