"""Tiled Pallas rasterizer (the TPU hot path).

This is the explicit, kernel-level replacement for the fixed-function
raster/depth hardware the reference drives through ``mach.gpu``
(``Renderer/Pipeline.zig:137-161``). Three stages per raster batch:

1. **Setup** (XLA): ``raster_common.triangle_setup`` -> per-triangle
   linear plane coefficients (edges, depth, varyings), packed
   f32[T, 32] with the triangle id as a lane.
2. **Binning** (XLA): each triangle's pixel AABB is mapped to the tile
   grid; (tile, triangle) pairs are encoded as ``tile * (T+1) + tri``
   keys and sorted — within a tile, triangles stay in ascending
   submission order by construction, which preserves the depth-tie
   semantics of the reference's 'less' test. The result is a *CSR*
   structure: one compact sorted entry-id array plus per-tile
   (start, count) offsets — no per-tile capacity, no bin overflow, no
   dense slack. Triangles spanning more than ``max_tiles_per_tri``
   tiles go to a small shared "big" block processed by every tile
   after its binned triangles (adaptively sized).
3. **Kernel** (Pallas, grid = tile rows x tile cols): each program owns
   one (tile_h, tile_w) framebuffer tile in VMEM. Per chunk of
   ``chunk`` triangles it DMAs the chunk's entry ids from HBM into
   SMEM, assembles their coefficient rows from the VMEM-resident
   packed table (in-kernel gather — XLA-side row gathers measured 3-6x
   slower), and evaluates all planes as (G, tile-pixels) outer-product
   FMAs (single-axis broadcasts, VPU-shaped). The depth resolve is a
   min-reduction over the chunk with lowest-triangle-id tie-break —
   exactly the sequential 'less' depth test's semantics, no atomics.
   Varying interpolation is fused: the winning triangle's varying
   numerators/denominator are selected by the same mask, so shading
   needs no per-pixel gathers.

Shading finishes in XLA: one division and the pipeline's fragment
function over dense [H, W] buffers (``shade_from_planes``).

The only static capacity left is ``max_tiles_per_tri`` (bbox tile span
before a triangle is routed to the big list) and the big list size,
which Draw scales adaptively when a frame reports big-list overflow.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
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
    tile_h: int = 32
    tile_w: int = 128
    max_tiles_per_tri: int = 8    # bbox tiles before a tri goes "big"
    max_table_rows: int = 32768   # VMEM packed-table capacity per pass
    big_capacity: int = 64        # full-frame triangles per batch
    big_scale: int = 1            # multiplier on big/clip capacity (adaptive)
    clip_capacity: int = 16       # eye-plane straddlers clipped per batch
    chunk: int = 16               # triangles per (G, THW) inner step
    interpret: bool = False      # Pallas interpreter (CPU testing)


DEFAULT_CONFIG = RasterConfig()


def _cdiv(a: int, b: int) -> int:
    return (a + b - 1) // b


# ---------------------------------------------------------------------------
# binning (XLA): CSR entries
# ---------------------------------------------------------------------------

def bin_triangles(tc: rc.TriCoeffs, tri_clip: jax.Array, height: int,
                  width: int, cfg: RasterConfig, y0=0,
                  vp_height: int | None = None):
    """CSR-bin triangles to tiles.

    Returns (entry_ids i32[E+pad], starts i32[NT], counts i32[NT],
    big_rows f32[1, B, LANES], big_count i32[1], overflow_big bool[]).
    E = max_tiles_per_tri * T is the static entry capacity; every
    triangle-tile incidence with span <= K gets a slot, so binned
    coverage is exact (no overflow).

    ``y0``/``vp_height`` support band rendering (the multi-chip row
    shards): the viewport transform always uses the FULL frame height
    ``vp_height``, while the tile grid covers rows [y0, y0 + height).
    ``y0`` may be a traced scalar (each shard binds its own offset).
    Triangles outside the band clamp to border tiles and are rejected
    by the kernel's (global-coordinate) coverage test."""
    T = tri_clip.shape[0]
    vp_height = height if vp_height is None else vp_height
    y0 = jnp.asarray(y0, jnp.float32)
    nty = _cdiv(height, cfg.tile_h)
    ntx = _cdiv(width, cfg.tile_w)
    NT = nty * ntx
    K = cfg.max_tiles_per_tri
    B = cfg.big_capacity * cfg.big_scale

    w = jnp.maximum(tri_clip[..., 3], rc.W_EPS)
    u = (0.5 * tri_clip[..., 0] / w + 0.5) * width       # [T, 3] pixel x
    v = (0.5 - 0.5 * tri_clip[..., 1] / w) * vp_height   # [T, 3] pixel y

    minx = jnp.clip(jnp.floor(u.min(1)), 0, width - 1)
    maxx = jnp.clip(jnp.ceil(u.max(1)), 0, width - 1)
    miny = jnp.clip(jnp.floor(v.min(1)) - y0, 0, height - 1)
    maxy = jnp.clip(jnp.ceil(v.max(1)) - y0, 0, height - 1)

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
    counts = ends - starts                             # [NT], uncapped

    entry_ids = jnp.clip(keys % (T + 1), 0, max(T - 1, 0)).astype(
        jnp.int32)
    # pad to a whole number of 1024-id DMA windows (i32 tile granularity)
    E = entry_ids.shape[0]
    epad = (-E) % 1024 + 1024
    entry_ids = jnp.concatenate([entry_ids,
                                 jnp.zeros(epad, jnp.int32)])
    entry_ids = entry_ids.reshape(-1, 128)             # [rows, 128]

    # big list: indices of 'big' triangles in submission order
    big_order = jnp.where(big, tri_idx, T)
    big_sorted = jnp.sort(big_order, stable=False)
    if T < B:   # keep the static big-list length at B
        big_sorted = jnp.concatenate(
            [big_sorted, jnp.full(B - T, T, jnp.int32)])
    big_count_full = big.sum(dtype=jnp.int32)
    overflow_big = big_count_full > B
    big_count = jnp.minimum(big_count_full, B)
    big_ids = jnp.clip(big_sorted[:B], 0, max(T - 1, 0)).astype(jnp.int32)
    packed = rc.pack_coeffs_full(tc)                   # [T, 32]
    big_rows = packed[big_ids][None]                   # [1, B, 32]

    # per-tile flag: does ANY big triangle's bbox touch the tile? lets
    # the kernel skip the big loop entirely on untouched tiles
    slotv = jnp.arange(B, dtype=jnp.int32)
    big_live = slotv < big_count                       # [B]
    btx0, btx1 = tx0[big_ids], tx1[big_ids]
    bty0, bty1 = ty0[big_ids], ty1[big_ids]
    t_y = tile_range // ntx
    t_x = tile_range % ntx
    hit = ((t_x[:, None] >= btx0[None, :]) & (t_x[:, None] <= btx1[None, :])
           & (t_y[:, None] >= bty0[None, :]) & (t_y[:, None] <= bty1[None, :])
           & big_live[None, :])                        # [NT, B]
    big_touch = hit.any(axis=1).astype(jnp.int32)      # [NT]

    return entry_ids, starts, counts, packed, big_rows, big_count[None], \
        big_touch, overflow_big


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _raster_kernel(y0_ref, starts_ref, counts_ref, big_count_ref,
                   big_touch_ref, entry_ids_hbm, packed_ref, big_ref,
                   depth_in_ref, fused_ref, winner_ref,
                   rows_scratch, ids_scratch, dma_sem,
                   *, tile_h: int, tile_w: int, base_index: int,
                   chunk: int):
    """One program = one (tile_h, tile_w) framebuffer tile.

    Streams the tile's CSR bin: the id stream is fetched in 1024-id DMA
    windows (the i32 tile granularity; segments need no alignment — a
    window may start before the segment), coefficient rows are
    assembled from the VMEM-resident packed table (in-kernel gather),
    and everything is evaluated as (G, THW) outer-product FMAs with a
    min-reduce depth resolve (lowest-id tie-break == submission-order
    'less' semantics; bins are ascending by construction)."""
    THW = tile_h * tile_w
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    ntx = pl.num_programs(1)
    t = ty * ntx + tx

    flat = lax.broadcasted_iota(jnp.int32, (1, THW), 1)
    px = ((flat % tile_w) + tx * tile_w).astype(jnp.float32) + 0.5
    # y0: global row of the band's first row (multi-chip row shards);
    # coverage/depth math always runs in GLOBAL pixel coordinates
    py = ((flat // tile_w) + ty * tile_h + y0_ref[0]).astype(
        jnp.float32) + 0.5

    start = starts_ref[t]
    n = counts_ref[t]
    end = start + n
    # skip the shared big-triangle loop on tiles no big bbox touches
    nbig = jnp.where(big_touch_ref[t] > 0, big_count_ref[0], 0)

    def eval_chunk(sub, live, carry):
        """sub: (G, LANES) coefficient rows; live: (G, 1) slot mask."""
        depth, winner, nums, den = carry
        scalars = tuple(sub[:, k:k + 1] for k in range(rc.COEFF_LANES))
        cov, z = rc.coverage_depth(scalars, px, py)    # (G, THW)
        cov = cov & live
        # sentinel must exceed ANY representable depth (layer-biased
        # merged passes go beyond 1.0)
        zm = jnp.where(cov, z, jnp.float32(jnp.inf))
        ids = jnp.broadcast_to(sub[:, 16:17], (chunk, THW))
        zmin = jnp.min(zm, axis=0, keepdims=True)      # (1, THW)
        idmin = jnp.min(jnp.where(zm == zmin, ids, jnp.float32(3e38)),
                        axis=0, keepdims=True)
        win = zmin < depth

        # varying planes of the winning row (exactly one row matches)
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

    # --- binned triangles: 1024-id windows, chunk sub-loops ------------
    blk0 = lax.div(start, 1024)
    nblk = jnp.where(n > 0, lax.div(end + 1023, 1024) - blk0, 0)

    def block_body(b, carry):
        base = (blk0 + b) * 1024
        dma = pltpu.make_async_copy(
            entry_ids_hbm.at[pl.ds((blk0 + b) * 8, 8), :],
            ids_scratch, dma_sem)
        dma.start()
        dma.wait()
        lo = jnp.maximum(start - base, 0)
        hi = jnp.minimum(end - base, 1024)

        def chunk_body(ci, carry):
            off = lo + ci * chunk

            def assemble(g, _):
                # clamp: the tail chunk's slots may run past the window
                # (they are masked out of coverage, but the scratch read
                # must stay in bounds)
                pos = jnp.minimum(off + g, 1023)
                idx = ids_scratch[lax.div(pos, 128), lax.rem(pos, 128)]
                rows_scratch[pl.ds(g, 1), :] = \
                    packed_ref[pl.ds(idx, 1), :]
                return 0

            lax.fori_loop(0, chunk, assemble, 0)
            pos = (lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
                   + base + off)
            live = pos < end
            return eval_chunk(rows_scratch[...], live, carry)

        nchunks = lax.div(hi - lo + chunk - 1, chunk)
        return lax.fori_loop(0, nchunks, chunk_body, carry)

    carry = (depth_in_ref[...].reshape(1, THW),
             jnp.full((1, THW), -1, jnp.int32),
             tuple(jnp.zeros((1, THW), jnp.float32) for _ in range(4)),
             jnp.ones((1, THW), jnp.float32))
    carry = lax.fori_loop(0, nblk, block_body, carry)

    # big triangles after binned ones (ties-only order deviation)
    def big_chunk(ci, carry):
        sub = big_ref[0, pl.ds(ci * chunk, chunk), :]
        slot = (lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
                + ci * chunk)
        return eval_chunk(sub, slot < nbig, carry)

    depth, winner, nums, den = lax.fori_loop(
        0, lax.div(nbig + chunk - 1, chunk), big_chunk, carry)

    # one fused f32 out block: [0]=depth, [1]=den, [2:6]=varying nums
    fused_ref[...] = jnp.concatenate(
        [depth.reshape(1, tile_h, tile_w),
         den.reshape(1, tile_h, tile_w)]
        + [nc.reshape(1, tile_h, tile_w) for nc in nums], axis=0)
    winner_ref[...] = winner.reshape(tile_h, tile_w)


def rasterize(tc: rc.TriCoeffs, height: int, width: int,
              depth: jax.Array | None = None,
              base_index: int = 0,
              tri_clip: jax.Array | None = None,
              cfg: RasterConfig | None = None,
              y0=0, vp_height: int | None = None):
    """Pallas fused rasterize pass.

    Returns (depth f32[H,W], winner i32[H,W], vary_num f32[4,H,W],
    vary_den f32[H,W], overflowed bool[2] = (bins, big list); the bins
    flag is always False with CSR binning). The perspective-correct
    varyings of the winning triangle at pixel p are
    ``vary_num[:, p] / vary_den[p]`` (denominator is 1 where uncovered).

    Decision-identical to ``raster_ref.rasterize_visibility`` (same
    winners; depth/color values may differ by ~1 ulp of FMA contraction)
    for scenes without exact big-vs-binned depth ties.

    ``tri_clip`` (clip positions) is required for binning.

    ``y0``/``vp_height``: render the frame band covering rows
    [y0, y0 + height) of a ``vp_height``-tall viewport (the multi-chip
    row-shard path; ``tc`` must come from triangle_setup with the FULL
    frame height). ``y0`` may be a traced scalar. Band output is
    bit-identical to the same rows of a full-frame render: per-tile bin
    contents, chunk grouping and pixel coordinates are all unchanged.
    """
    cfg = cfg or DEFAULT_CONFIG
    if tri_clip is None:
        raise ValueError("pallas backend needs tri_clip for binning")
    if depth is None:
        depth = jnp.full((height, width), 1.0, jnp.float32)

    T = tri_clip.shape[0]
    nty = _cdiv(height, cfg.tile_h)
    ntx = _cdiv(width, cfg.tile_w)
    ph, pw = nty * cfg.tile_h, ntx * cfg.tile_w
    B = cfg.big_capacity * cfg.big_scale
    chunk = min(cfg.chunk, B)
    if B % chunk:
        raise ValueError(f"big capacity ({B}) must be a multiple of "
                         f"chunk ({chunk})")

    (entry_ids, starts, counts, packed, big_rows, big_count, big_touch,
     ovf_big) = bin_triangles(tc, tri_clip, height, width, cfg, y0=y0,
                              vp_height=vp_height)

    y0_arr = jnp.asarray(y0, jnp.int32).reshape(1)
    depth_p = jnp.pad(depth, ((0, ph - height), (0, pw - width)),
                      constant_values=1.0)

    kernel = functools.partial(_raster_kernel, tile_h=cfg.tile_h,
                               tile_w=cfg.tile_w, base_index=base_index,
                               chunk=chunk)
    tile_spec = pl.BlockSpec((cfg.tile_h, cfg.tile_w),
                             lambda ty, tx: (ty, tx),
                             memory_space=pltpu.VMEM)
    fused, winner = pl.pallas_call(
        kernel,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # y0
            pl.BlockSpec(memory_space=pltpu.SMEM),           # starts
            pl.BlockSpec(memory_space=pltpu.SMEM),           # counts
            pl.BlockSpec(memory_space=pltpu.SMEM),           # big count
            pl.BlockSpec(memory_space=pltpu.SMEM),           # big touch
            pl.BlockSpec(memory_space=pltpu.HBM),            # entry ids
            pl.BlockSpec((packed.shape[0], LANES),
                         lambda ty, tx: (0, 0),
                         memory_space=pltpu.VMEM),           # packed table
            pl.BlockSpec((1, B, LANES), lambda ty, tx: (0, 0, 0),
                         memory_space=pltpu.VMEM),           # big rows
            tile_spec,                                       # depth in
        ],
        out_specs=[pl.BlockSpec((6, cfg.tile_h, cfg.tile_w),
                                lambda ty, tx: (0, ty, tx),
                                memory_space=pltpu.VMEM),
                   tile_spec],
        out_shape=[
            jax.ShapeDtypeStruct((6, ph, pw), jnp.float32),
            jax.ShapeDtypeStruct((ph, pw), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((chunk, LANES), jnp.float32),         # rows
            pltpu.SMEM((8, 128), jnp.int32),                 # id window
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=cfg.interpret,
    )(y0_arr, starts, counts, big_count, big_touch, entry_ids, packed,
      big_rows, depth_p)

    overflowed = jnp.stack([jnp.zeros((), bool), ovf_big])
    return (fused[0, :height, :width], winner[:height, :width],
            fused[2:6, :height, :width], fused[1, :height, :width],
            overflowed)


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
