"""Config-matrix fuzz: random valid RasterConfigs must all be
bit-identical to the oracle.

The kernel's config space (tile shape x chunk x window x groups x
subtiles x packed_stream x span budget) interacts in ways the
hand-written tests sample only at named points; this seeded fuzz
sweeps random corners. Decisions (winners), depth, and varying planes
must match the oracle exactly for EVERY legal config — the rulebook
(raster_common) is the single source of truth and the kernel is just
an execution strategy (SURVEY.md section 4 test strategy: golden
parity over implementation details)."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from myrenderer_tpu.ops import raster_common as rc
from myrenderer_tpu.ops import raster_pallas as rp
from myrenderer_tpu.ops import raster_ref as rr

from test_raster_pallas import random_triangles


def _random_cfg(rng):
    tile_h = int(rng.choice([8, 16, 32]))
    chunk_choices = [8, 16, 32, 64]
    packed = bool(rng.random() < 0.3)
    if packed:
        chunk_choices = [32, 64]
    chunk = int(rng.choice(chunk_choices))
    window = int(chunk * rng.choice([1, 2, 4]))
    if window % 8:
        window = chunk * 8
    if packed and window % 32:
        window = max(chunk, 32) * 4
    subtiles = 1 if packed else int(rng.choice([1, 1, 2, 4]))
    while tile_h % subtiles:
        subtiles //= 2
    span = int(rng.choice([0, 2, 6, 16]))
    return rp.RasterConfig(
        tile_h=tile_h, tile_w=128, chunk=chunk, stream_window=window,
        subtiles=subtiles, packed_stream=packed,
        big_capacity=512, big_scale=2,
        **({"max_tiles_per_tri": span, "auto_span": False}
           if span else {}),
        interpret=True)


def test_random_configs_match_oracle():
    rng = np.random.default_rng(2026)
    H, W = 56, 272                      # padded partial tiles both axes
    clip, vary = random_triangles(150, seed=11)
    valid = jnp.ones(150, bool)
    tc = rc.triangle_setup(clip, vary, valid, W, H, "back")
    d_ref, w_ref = rr.rasterize_visibility(tc, H, W)

    for trial in range(6):
        cfg = _random_cfg(rng)
        d, w, n, e, o = rp.rasterize(tc, H, W, tri_clip=clip, cfg=cfg)
        assert not bool(np.asarray(o).any()), (trial, cfg)
        np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w),
                                      err_msg=f"trial {trial}: {cfg}")
        np.testing.assert_array_equal(np.asarray(d_ref), np.asarray(d),
                                      err_msg=f"trial {trial}: {cfg}")
