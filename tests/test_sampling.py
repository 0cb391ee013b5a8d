"""Texture-sampling unit tests (clamp-to-edge addressing, WebGPU-style
normalized UV — the explicit-math samplers that replace fixed-function
sampler hardware, ``Renderer/Pipeline.zig:111``)."""

import jax.numpy as jnp
import numpy as np

from myrenderer_tpu.ops.sampling import sample_bilinear, sample_nearest


def row_tex(vals):
    """1-row texture f32[1, W, 1] from a list of scalars."""
    return jnp.asarray(np.array(vals, np.float32)[None, :, None])


def test_bilinear_left_edge_clamps_to_texel0():
    tex = row_tex([0.0, 1.0, 2.0, 3.0])
    uv = jnp.array([0.0, 0.5], jnp.float32)   # u=0: left border
    out = sample_bilinear(tex, uv)
    np.testing.assert_allclose(np.asarray(out), [0.0], atol=1e-7)


def test_bilinear_right_edge_clamps_to_last_texel():
    tex = row_tex([0.0, 1.0, 2.0, 3.0])
    uv = jnp.array([1.0, 0.5], jnp.float32)
    out = sample_bilinear(tex, uv)
    np.testing.assert_allclose(np.asarray(out), [3.0], atol=1e-7)


def test_bilinear_top_edge_clamps():
    tex = jnp.asarray(np.array([[0.0], [1.0], [2.0]],
                               np.float32)[:, :, None])  # [3,1,1]
    uv = jnp.array([0.5, 0.0], jnp.float32)   # v=0: top border
    out = sample_bilinear(tex, uv)
    np.testing.assert_allclose(np.asarray(out), [0.0], atol=1e-7)


def test_bilinear_interior_blend():
    tex = row_tex([0.0, 1.0])
    # u=0.5: halfway between texel centers 0.25 and 0.75 -> 0.5
    out = sample_bilinear(tex, jnp.array([0.5, 0.5], jnp.float32))
    np.testing.assert_allclose(np.asarray(out), [0.5], atol=1e-7)
    # u at texel 0's center: exactly texel 0
    out = sample_bilinear(tex, jnp.array([0.25, 0.5], jnp.float32))
    np.testing.assert_allclose(np.asarray(out), [0.0], atol=1e-7)


def test_nearest_picks_containing_texel():
    tex = row_tex([0.0, 1.0, 2.0, 3.0])
    for u, want in [(0.0, 0.0), (0.26, 1.0), (0.6, 2.0), (0.99, 3.0),
                    (1.0, 3.0)]:
        out = sample_nearest(tex, jnp.array([u, 0.5], jnp.float32))
        np.testing.assert_allclose(np.asarray(out), [want], atol=1e-7)


def test_batched_uv_shapes():
    tex = row_tex([0.0, 1.0, 2.0, 3.0])
    uv = jnp.broadcast_to(jnp.array([0.5, 0.5], jnp.float32), (5, 7, 2))
    assert sample_bilinear(tex, uv).shape == (5, 7, 1)
    assert sample_nearest(tex, uv).shape == (5, 7, 1)
