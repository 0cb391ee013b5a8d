"""Reference (oracle) rasterizer: slow, obviously correct, pure jnp.

Full-frame evaluation, sequential loop over triangles in submission
order. This is the golden oracle standing in for the reference's missing
test suite (SURVEY.md §4): the Pallas path must match it bit-for-bit on
depth/coverage decisions because both consume ``raster_common`` rules.

Runs anywhere (CPU under tests, TPU as a fallback backend).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import raster_common as rc


def rasterize_visibility(tc: rc.TriCoeffs, height: int, width: int,
                         depth: jax.Array | None = None,
                         winner: jax.Array | None = None,
                         base_index: int = 0):
    """Pass 1 over the full frame: returns (depth f32[H,W],
    winner i32[H,W]) where winner is the index (plus ``base_index``) of
    the front-most triangle, -1 where uncovered."""
    px, py = rc.pixel_grids(height, width)
    if depth is None:
        depth = jnp.full((height, width), 1.0, jnp.float32)
    if winner is None:
        winner = jnp.full((height, width), -1, jnp.int32)

    packed = rc.pack_coeffs(tc)                  # [T, 16]

    def body(t, carry):
        depth, winner = carry
        row = tuple(packed[t, i] for i in range(rc.COEFF_LANES))
        cov, z = rc.coverage_depth(row, px, py)
        return rc.depth_test_update(cov, z, depth, winner,
                                    jnp.int32(base_index) + t)

    depth, winner = jax.lax.fori_loop(0, packed.shape[0], body,
                                      (depth, winner))
    return depth, winner


def shade(tc: rc.TriCoeffs, winner: jax.Array, fb: jax.Array,
          fragment_fn, base_index: int = 0, ctx=None) -> jax.Array:
    """Pass 2: perspective-correct varyings for winning pixels, run the
    pipeline's fragment function, and write (replace — the reference's
    color target has no blending, ``Pipeline.zig:137-140``). ``ctx``
    (a ``vertex_stage.FragmentCtx``) is forwarded to two-parameter
    fragment programs — fragment-stage binding access."""
    height, width = winner.shape
    px, py = rc.pixel_grids(height, width)
    local = winner - jnp.int32(base_index)
    in_range = (local >= 0) & (local < tc.en_abc.shape[0])
    varp, _ = rc.resolve_varyings(tc, jnp.where(in_range, local, 0), px, py)
    rgba = fragment_fn(varp) if ctx is None else fragment_fn(varp, ctx)
    return jnp.where(in_range[..., None], rgba, fb)


def rasterize(tri_clip: jax.Array, tri_vary: jax.Array, valid: jax.Array,
              fb: jax.Array, depth: jax.Array, fragment_fn,
              cull_mode: str = "back"):
    """Convenience single-batch entry: vis pass + shade. Returns
    (fb, depth)."""
    height, width = depth.shape
    tc = rc.triangle_setup(tri_clip, tri_vary, valid, width, height,
                           cull_mode)
    depth, winner = rasterize_visibility(tc, height, width, depth=depth)
    fb = shade(tc, winner, fb, fragment_fn)
    return fb, depth
