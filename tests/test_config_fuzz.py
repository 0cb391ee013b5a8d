"""Config-matrix fuzz: random valid RasterConfigs must all be
bit-identical to the oracle.

The kernel's config space (tile shape x chunk x window x groups x
bands x tiles_x x span budget) interacts in ways the
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
    tile_h = int(rng.choice([8, 16, 32, 64]))
    chunk = int(rng.choice([8, 16, 32, 64]))
    window = int(chunk * rng.choice([1, 2, 4]))
    if window % 8:
        window = chunk * 8
    bands = int(rng.choice([1, 1, 1, 2]))
    tiles_x = int(rng.choice([1, 1, 1, 3]))
    if bands > 1 or tiles_x > 1:
        bands, tiles_x = (bands, 1) if rng.random() < 0.5 \
            else (1, tiles_x)
    span = int(rng.choice([0, 2, 6, 16]))
    return rp.RasterConfig(
        tile_h=tile_h, tile_w=128, chunk=chunk, stream_window=window,
        bands=bands, tiles_x=tiles_x,
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

    # auto_config's 8K pick (t64c32w128) always in the matrix: tile_h
    # 64 reached production in round 5 and H=56 < 64 also pins the
    # single-partial-tile padding path at the largest tile
    t64 = rp.RasterConfig(tile_h=64, tile_w=128, chunk=32,
                          stream_window=128, big_capacity=512,
                          big_scale=2, interpret=True)
    cfgs = [t64] + [_random_cfg(rng) for _ in range(6)]
    for trial, cfg in enumerate(cfgs):
        d, w, n, e, o = rp.rasterize(tc, H, W, tri_clip=clip, cfg=cfg)
        assert not bool(np.asarray(o).any()), (trial, cfg)
        np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w),
                                      err_msg=f"trial {trial}: {cfg}")
        np.testing.assert_array_equal(np.asarray(d_ref), np.asarray(d),
                                      err_msg=f"trial {trial}: {cfg}")
