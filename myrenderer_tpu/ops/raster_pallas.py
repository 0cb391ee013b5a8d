"""Tiled Pallas rasterizer (the TPU hot path).

This is the explicit, kernel-level replacement for the fixed-function
raster/depth hardware the reference drives through ``mach.gpu``
(``Renderer/Pipeline.zig:137-161``). Three stages per raster batch:

1. **Setup** (XLA): ``raster_common.triangle_setup`` -> per-triangle
   linear coefficients, packed f32[T, 16] (+ the triangle id as a 17th
   lane so the kernel never needs an index side-channel).
2. **Binning** (XLA): each triangle's pixel AABB is mapped to the tile
   grid; (tile, triangle) pairs are encoded as ``tile * (T+1) + tri``
   keys and sorted — within a tile, triangles stay in ascending
   submission order by construction, which preserves the depth-tie
   semantics of the reference's 'less' test. The coefficient rows are
   then *pre-gathered* into per-(tile, round) blocks — gather is XLA's
   strength; the kernel only ever streams contiguous memory. Triangles
   spanning more than ``max_tiles_per_tri`` tiles go to a small shared
   "big" block processed by every tile after its binned rounds.
3. **Kernel** (Pallas, grid = (tile rows, tile cols, rounds)): each
   program owns one (tile_h, tile_w) framebuffer tile resident in VMEM
   across all its rounds while Pallas pipelines the (C, 17) coefficient
   blocks in. The round's triangles are walked sequentially — no
   atomics needed, the loop order IS the depth resolve — evaluating
   edge/depth planes as (1,1)-broadcast FMAs over the tile's pixel grid
   (``raster_common.coverage_depth``, the same rule the oracle uses, so
   per-pixel *decisions* are bit-identical), writing per-pixel depth +
   winning triangle index.

Shading stays in XLA: the winner buffer is a visibility buffer; the
batch's fragment function runs once per pixel on perspective-correct
interpolated varyings (``raster_ref.shade``).

Capacity model (XLA needs static shapes): ``bin_capacity`` triangles
per tile per *round*, with the round count auto-sized from the
scene/tile ratio unless given. Per-tile overflow beyond
``rounds * bin_capacity`` drops triangles and sets the overflow flag
(callers/tests/bench assert it's clear); at small framebuffers the
auto sizing degrades gracefully to brute force (every triangle in
every tile's bins).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import raster_common as rc

# full pack: 16 visibility lanes + id + varying planes
LANES = rc.FULL_LANES


@dataclass(frozen=True)
class RasterConfig:
    tile_h: int = 16
    tile_w: int = 128
    bin_capacity: int = 512       # triangles per tile per round
    bin_rounds: Optional[int] = None  # None = auto from scene density
    round_scale: int = 1          # multiplier on auto rounds (adaptive)
    max_tiles_per_tri: int = 16   # bbox tiles before a tri goes "big"
    big_capacity: int = 64        # full-frame triangles per batch
    big_scale: int = 1            # multiplier on big_capacity (adaptive)
    chunk: int = 64               # triangles per (G, THW) inner step
    interpret: bool = False       # Pallas interpreter (CPU testing)


DEFAULT_CONFIG = RasterConfig()


def _cdiv(a: int, b: int) -> int:
    return (a + b - 1) // b


def _auto_rounds(T: int, NT: int, cfg: RasterConfig) -> int:
    """Rounds so that ~8x the mean triangles-per-tile fits (scaled by
    ``round_scale``, which Draw bumps when a frame reports overflow);
    degrades to brute force (all T triangles per tile) when tiles are
    few or the scale grows."""
    per_tile = min(T, max(256, (8 * T) // max(NT, 1)) * cfg.round_scale)
    return max(1, _cdiv(per_tile, cfg.bin_capacity))


# ---------------------------------------------------------------------------
# binning (XLA)
# ---------------------------------------------------------------------------

def bin_triangles(tc: rc.TriCoeffs, tri_clip: jax.Array, height: int,
                  width: int, cfg: RasterConfig, rounds: int):
    """Bin triangles and pre-gather their coefficient rows.

    Returns (binned f32[NT*R, C, LANES], counts i32[NT*R],
    big f32[1, B, LANES], big_count i32[1], overflowed bool[])."""
    T = tri_clip.shape[0]
    nty = _cdiv(height, cfg.tile_h)
    ntx = _cdiv(width, cfg.tile_w)
    NT = nty * ntx
    K = cfg.max_tiles_per_tri
    C = cfg.bin_capacity
    B = cfg.big_capacity * cfg.big_scale
    cap_total = rounds * C

    w = jnp.maximum(tri_clip[..., 3], rc.W_EPS)
    u = (0.5 * tri_clip[..., 0] / w + 0.5) * width    # [T, 3] pixel x
    v = (0.5 - 0.5 * tri_clip[..., 1] / w) * height   # [T, 3] pixel y

    minx = jnp.clip(jnp.floor(u.min(1)), 0, width - 1)
    maxx = jnp.clip(jnp.ceil(u.max(1)), 0, width - 1)
    miny = jnp.clip(jnp.floor(v.min(1)), 0, height - 1)
    maxy = jnp.clip(jnp.ceil(v.max(1)), 0, height - 1)

    tx0 = (minx / cfg.tile_w).astype(jnp.int32)
    tx1 = (maxx / cfg.tile_w).astype(jnp.int32)
    ty0 = (miny / cfg.tile_h).astype(jnp.int32)
    ty1 = (maxy / cfg.tile_h).astype(jnp.int32)
    sx = tx1 - tx0 + 1
    sy = ty1 - ty0 + 1
    span = sx * sy                                     # [T]

    small = tc.valid & (span <= K)
    big = tc.valid & (span > K)

    # K candidate tiles per triangle, row-major over its bbox tile rect
    e = jnp.arange(K, dtype=jnp.int32)                 # [K]
    ey = e[None, :] // jnp.maximum(sx, 1)[:, None]     # [T, K]
    ex = e[None, :] % jnp.maximum(sx, 1)[:, None]
    tile = (ty0[:, None] + ey) * ntx + (tx0[:, None] + ex)
    live = small[:, None] & (e[None, :] < span[:, None])
    tile = jnp.where(live, tile, NT)                   # NT = invalid bucket

    # keys = tile * (T+1) + tri: per-tile contiguity, ascending
    # submission order within a tile. int32 bounds the scale:
    if (NT + 1) * (T + 1) >= 2**31:
        raise ValueError(
            f"binning key space overflow: {NT} tiles x {T} triangles; "
            "raise tile size or split the batch")
    tri_idx = jnp.arange(T, dtype=jnp.int32)
    keys = (tile * (T + 1) + tri_idx[None, :].T).reshape(-1)
    keys = jnp.sort(keys, stable=False)   # keys are unique

    tile_range = jnp.arange(NT, dtype=jnp.int32)
    starts = jnp.searchsorted(keys, tile_range * (T + 1)).astype(jnp.int32)
    ends = jnp.searchsorted(keys, (tile_range + 1) * (T + 1)).astype(
        jnp.int32)
    counts_full = ends - starts                        # [NT]
    overflow_small = jnp.any(counts_full > cap_total)

    slot = jnp.arange(cap_total, dtype=jnp.int32)[None, :]
    gather_pos = jnp.clip(starts[:, None] + slot, 0, keys.shape[0] - 1)
    bin_ids = (keys[gather_pos] % (T + 1)).astype(jnp.int32)  # [NT, capT]

    total = jnp.minimum(counts_full, cap_total)
    r = jnp.arange(rounds, dtype=jnp.int32)[None, :]
    counts = jnp.clip(total[:, None] - r * C, 0, C)    # [NT, R]

    # packed coefficient+varying rows, gathered per bin slot
    packed = rc.pack_coeffs_full(tc)                   # [T, 32]
    binned = packed[bin_ids.reshape(-1)].reshape(
        NT * rounds, C, LANES)

    # big list: indices of 'big' triangles in submission order
    big_order = jnp.where(big, tri_idx, T)
    big_sorted = jnp.sort(big_order)
    big_count_full = big.sum(dtype=jnp.int32)
    overflow_big = big_count_full > B
    big_count = jnp.minimum(big_count_full, B)
    big_ids = jnp.clip(big_sorted[:B], 0, max(T - 1, 0)).astype(jnp.int32)
    big_rows = packed[big_ids][None]                   # [1, B, 17]

    overflowed = jnp.stack([overflow_small, overflow_big])
    return binned, counts.reshape(-1), big_rows, big_count[None], overflowed


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _raster_kernel(counts_ref, big_count_ref, binned_ref, big_ref,
                   depth_in_ref, depth_out_ref, winner_ref, num_ref,
                   den_ref,
                   *, tile_h: int, tile_w: int, base_index: int,
                   rounds: int, chunk: int):
    """One program = one (tile_h, tile_w) framebuffer tile x one round.

    TPU-shaped inner loop: triangles are processed ``chunk`` at a time
    as (G, THW) arrays — per-triangle coefficients are (G, 1) columns,
    per-pixel coordinates a (1, THW) row, so every edge/depth/varying
    plane is an outer-product FMA (single-axis broadcasts only,
    VPU-friendly). The depth resolve is a min-reduction over the chunk
    axis with lowest-triangle-id tie-break, which equals the reference's
    sequential 'less' depth test because bins hold ascending triangle
    ids: equal depths resolve to the earliest submission.

    Shading is fused: the winning triangle's varying numerators and
    denominator are selected in the same pass (visibility buffer +
    interpolation without any per-pixel gather), leaving only the
    division and the fragment function to dense XLA ops outside.
    """
    THW = tile_h * tile_w
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    r = pl.program_id(2)
    ntx = pl.num_programs(1)

    flat = lax.broadcasted_iota(jnp.int32, (1, THW), 1)
    px = ((flat % tile_w) + tx * tile_w).astype(jnp.float32) + 0.5
    py = ((flat // tile_w) + ty * tile_h).astype(jnp.float32) + 0.5

    # Round 0 initializes the tile; the out blocks stay resident in VMEM
    # across this tile's consecutive rounds (same block index).
    @pl.when(r == 0)
    def _():
        depth_out_ref[...] = depth_in_ref[...]
        winner_ref[...] = jnp.full((tile_h, tile_w), -1, jnp.int32)
        num_ref[...] = jnp.zeros((4, tile_h, tile_w), jnp.float32)
        den_ref[...] = jnp.ones((tile_h, tile_w), jnp.float32)

    num_block = num_ref[...]                       # (4, TH, TW)
    carry0 = (depth_out_ref[...].reshape(1, THW),
              winner_ref[...].reshape(1, THW),
              tuple(num_block[ch].reshape(1, THW) for ch in range(4)),
              den_ref[...].reshape(1, THW))

    n = counts_ref[(ty * ntx + tx) * rounds + r]

    def make_chunk_body(ref, bound):
        def chunk_body(ci, carry):
            depth, winner, nums, den = carry
            start = ci * chunk
            sub = ref[0, pl.ds(start, chunk), :]       # (G, LANES)
            scalars = tuple(sub[:, k:k + 1]
                            for k in range(rc.COEFF_LANES))
            cov, z = rc.coverage_depth(scalars, px, py)  # (G, THW)
            slot = (lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
                    + start)
            cov = cov & (slot < bound)                 # mask bin tail
            zm = jnp.where(cov, z, jnp.float32(2.0))
            ids = jnp.broadcast_to(sub[:, 16:17], (chunk, THW))
            zmin = jnp.min(zm, axis=0, keepdims=True)  # (1, THW)
            idmin = jnp.min(jnp.where(zm == zmin, ids,
                                      jnp.float32(3e38)),
                            axis=0, keepdims=True)
            win = zmin < depth

            # varying planes of the winning row (exactly one row matches
            # zmin & idmin & cov at each winning pixel)
            is_win_row = cov & (zm == zmin) & (ids == idmin)
            wf = is_win_row.astype(jnp.float32)

            def plane(ka, kb, kc):
                val = (sub[:, ka:ka + 1] * px + sub[:, kb:kb + 1] * py
                       + sub[:, kc:kc + 1])
                return jnp.sum(wf * val, axis=0, keepdims=True)

            den_c = plane(17, 18, 19)
            nums_c = tuple(plane(20 + 3 * ch, 21 + 3 * ch, 22 + 3 * ch)
                           for ch in range(4))

            idw = idmin.astype(jnp.int32) + jnp.int32(base_index)
            return (jnp.where(win, zmin, depth),
                    jnp.where(win, idw, winner),
                    tuple(jnp.where(win, nc, old)
                          for nc, old in zip(nums_c, nums)),
                    jnp.where(win, den_c, den))
        return chunk_body

    nchunks = lax.div(n + chunk - 1, chunk)
    carry = lax.fori_loop(0, nchunks, make_chunk_body(binned_ref, n),
                          carry0)

    # big triangles run once, after all binned rounds (ties-only
    # deviation from global submission order; documented)
    nbig = big_count_ref[0]

    def run_big(cr):
        nb = lax.div(nbig + chunk - 1, chunk)
        return lax.fori_loop(0, nb, make_chunk_body(big_ref, nbig), cr)

    depth, winner, nums, den = lax.cond(r == rounds - 1, run_big,
                                        lambda cr: cr, carry)

    depth_out_ref[...] = depth.reshape(tile_h, tile_w)
    winner_ref[...] = winner.reshape(tile_h, tile_w)
    num_ref[...] = jnp.concatenate(
        [n.reshape(1, tile_h, tile_w) for n in nums], axis=0)
    den_ref[...] = den.reshape(tile_h, tile_w)


def rasterize(tc: rc.TriCoeffs, height: int, width: int,
              depth: jax.Array | None = None,
              base_index: int = 0,
              tri_clip: jax.Array | None = None,
              cfg: RasterConfig | None = None):
    """Pallas fused rasterize pass.

    Returns (depth f32[H,W], winner i32[H,W], vary_num f32[4,H,W],
    vary_den f32[H,W], overflowed bool[2] = (bins, big list)). The
    perspective-correct
    varyings of the winning triangle at pixel p are
    ``vary_num[:, p] / vary_den[p]`` (denominator is 1 where uncovered).

    Decision-identical to ``raster_ref.rasterize_visibility`` (same
    winners; depth/color values may differ by ~1 ulp of FMA contraction)
    for non-overflowing scenes without exact cross-category depth ties.

    ``tri_clip`` (clip positions) is required for binning.
    """
    cfg = cfg or DEFAULT_CONFIG
    if tri_clip is None:
        raise ValueError("pallas backend needs tri_clip for binning")
    if depth is None:
        depth = jnp.full((height, width), 1.0, jnp.float32)

    T = tri_clip.shape[0]
    nty = _cdiv(height, cfg.tile_h)
    ntx = _cdiv(width, cfg.tile_w)
    NT = nty * ntx
    ph, pw = nty * cfg.tile_h, ntx * cfg.tile_w
    rounds = cfg.bin_rounds or _auto_rounds(T, NT, cfg)

    binned, counts, big_rows, big_count, overflowed = bin_triangles(
        tc, tri_clip, height, width, cfg, rounds)

    depth_p = jnp.pad(depth, ((0, ph - height), (0, pw - width)),
                      constant_values=1.0)

    B = cfg.big_capacity * cfg.big_scale
    chunk = min(cfg.chunk, cfg.bin_capacity, B)
    if cfg.bin_capacity % chunk or B % chunk:
        raise ValueError(
            f"bin_capacity ({cfg.bin_capacity}) and big capacity "
            f"({B}) must be multiples of chunk ({chunk})")
    kernel = functools.partial(_raster_kernel, tile_h=cfg.tile_h,
                               tile_w=cfg.tile_w, base_index=base_index,
                               rounds=rounds, chunk=chunk)
    tile_spec = pl.BlockSpec((cfg.tile_h, cfg.tile_w),
                             lambda ty, tx, r: (ty, tx),
                             memory_space=pltpu.VMEM)
    depth_out, winner, num, den = pl.pallas_call(
        kernel,
        grid=(nty, ntx, rounds),
        in_specs=[
            # whole count table + big count live in SMEM (a few KB)
            pl.BlockSpec(memory_space=pltpu.SMEM),           # counts
            pl.BlockSpec(memory_space=pltpu.SMEM),           # big count
            pl.BlockSpec((1, cfg.bin_capacity, LANES),
                         lambda ty, tx, r, R=rounds, ntx=ntx:
                         ((ty * ntx + tx) * R + r, 0, 0),
                         memory_space=pltpu.VMEM),           # binned coeffs
            pl.BlockSpec((1, B, LANES),
                         lambda ty, tx, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),           # big coeffs
            tile_spec,                                       # depth in
        ],
        out_specs=[
            tile_spec,                                       # depth out
            tile_spec,                                       # winner
            pl.BlockSpec((4, cfg.tile_h, cfg.tile_w),
                         lambda ty, tx, r: (0, ty, tx),
                         memory_space=pltpu.VMEM),           # vary num
            tile_spec,                                       # vary den
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ph, pw), jnp.float32),
            jax.ShapeDtypeStruct((ph, pw), jnp.int32),
            jax.ShapeDtypeStruct((4, ph, pw), jnp.float32),
            jax.ShapeDtypeStruct((ph, pw), jnp.float32),
        ],
        interpret=cfg.interpret,
    )(counts, big_count, binned, big_rows, depth_p)

    return (depth_out[:height, :width], winner[:height, :width],
            num[:, :height, :width], den[:height, :width], overflowed)


def rasterize_visibility(tc: rc.TriCoeffs, height: int, width: int,
                         depth: jax.Array | None = None,
                         base_index: int = 0,
                         tri_clip: jax.Array | None = None,
                         cfg: RasterConfig | None = None,
                         return_overflow: bool = False):
    """Visibility-only view of :func:`rasterize` (oracle-compatible
    signature, used by parity tests)."""
    d, w, _num, _den, ovf = rasterize(tc, height, width, depth=depth,
                                      base_index=base_index,
                                      tri_clip=tri_clip, cfg=cfg)
    if return_overflow:
        return d, w, ovf.any()
    return d, w


def shade_from_planes(winner, num, den, fb, fragment_fn):
    """Dense shading from the kernel's interpolated planes: apply the
    fragment function and write covered pixels (replace — no blending,
    ``Pipeline.zig:137-140``)."""
    covered = winner >= 0
    varp = jnp.moveaxis(num, 0, -1) / den[..., None]
    rgba = fragment_fn(varp)
    return jnp.where(covered[..., None], rgba, fb)
