"""Texture sampling helpers for vertex/fragment functions.

The reference declares texture bindings (``Pipeline.zig:34-55``
texture_view / texture_sampler; ``Instance.zig:16-31`` attachments) but
never uses them — no textures exist in the repo. These helpers complete
the capability: a texture is just an f32[H, W, C] binding attachment,
and sampling is explicit math inside the pipeline's functions (there is
no fixed-function sampler hardware to call on a TPU).

Coordinates are WebGPU-style normalized UV (u right, v down, [0, 1]);
addressing is clamp-to-edge.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_nearest(tex, uv):
    """Nearest-neighbor sample. tex: f32[H, W, C]; uv: f32[..., 2].
    Returns f32[..., C]."""
    h, w = tex.shape[0], tex.shape[1]
    x = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return tex[y, x]


def sample_bilinear(tex, uv):
    """Bilinear sample (a 'filtering' sampler,
    ``Pipeline.zig:111``). tex: f32[H, W, C]; uv: f32[..., 2]."""
    h, w = tex.shape[0], tex.shape[1]
    fx = uv[..., 0] * w - 0.5
    fy = uv[..., 1] * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    # clamp-to-edge: x1 comes from the UNCLAMPED floor (clamping first
    # would blend texels 0 and 1 at the left/top borders: at u=0 the
    # correct result is texel 0 exactly, tx weighting a duplicate of it)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    t00 = tex[y0i, x0i]
    t01 = tex[y0i, x1i]
    t10 = tex[y1i, x0i]
    t11 = tex[y1i, x1i]
    top = t00 * (1 - tx) + t01 * tx
    bot = t10 * (1 - tx) + t11 * tx
    return top * (1 - ty) + bot * ty
