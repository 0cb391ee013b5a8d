"""Tiled Pallas rasterizer (the TPU hot path).

This is the explicit, kernel-level replacement for the fixed-function
raster/depth hardware the reference drives through ``mach.gpu``
(``Renderer/Pipeline.zig:137-161``). Three stages per raster batch:

1. **Setup** (XLA): ``raster_common.triangle_setup`` -> per-triangle
   linear plane coefficients (edges, depth, varyings), packed
   f32[T, 32] with the triangle id as a lane.
2. **Binning** (XLA): each triangle's pixel AABB is mapped to the tile
   grid; (tile, triangle) incidences are sorted by a fused single
   int32/uint32 key (several times faster than a variadic two-key sort,
   which remains as the fallback for huge key spaces), which keeps
   triangles within a tile in ascending submission order, preserving
   the depth-tie semantics of the reference's 'less' test. The result
   is a *CSR* structure: per-tile (start, count) offsets into one
   **pre-gathered coefficient-row stream** in HBM (rows in bin order) —
   no per-tile capacity, no dense slack, and no VMEM-resident table, so
   ONE kernel pass handles any triangle count. The stream itself has an
   adaptive capacity (``stream_factor * T`` rows, overflow-flagged):
   XLA row gathers cost ~25-45 ns/row regardless of layout, so gathering
   the K*T worst case would dominate the frame at megatriangle scale;
   live incidences sort ahead of the dead slack and only the capacity
   prefix is gathered. Triangles spanning more than
   ``max_tiles_per_tri`` tiles go to a small shared "big" block
   processed by every tile after its binned triangles (adaptively
   sized).
3. **Kernel** (Pallas, grid = tile rows x tile cols): each program owns
   one (tile_h, tile_w) framebuffer tile in VMEM. The tile's slice of
   the row stream is DMAed in ``stream_window``-row windows,
   double-buffered (window b+1 transfers while window b evaluates; the
   NEXT tile's first window is prefetched during the current tile's
   epilogue, hiding the DMA latency that dominates sparse tiles).
   Windows are RESIDENT across tile boundaries: a one-scalar SMEM
   cursor remembers the last window waited on, so when consecutive
   tiles' CSR segments share a window (the common case at sparse
   scenes, where several ~22-row segments fit one window) the next
   tile issues NO transfer and NO wait — the round-4 fixed-cost
   forensics attributed the demo kernel's 6x per-entry cost premium
   to exactly these redundant boundary DMA waits (BASELINE.md).
   Each window is evaluated in ``chunk``-row sub-blocks as
   (G, tile-pixels) outer-product FMAs (single-axis broadcasts,
   VPU-shaped). The depth resolve is a min-reduction over the chunk
   with lowest-triangle-id tie-break — exactly the sequential 'less'
   depth test's semantics, no atomics. Varying interpolation is fused:
   the winning triangle's varying numerators/denominator are selected
   by the same mask, so shading needs no per-pixel gathers.

Shading finishes in XLA: one division and the pipeline's fragment
function over dense [H, W] buffers (``shade_from_planes``).

The static capacities are ``max_tiles_per_tri`` (bbox tile span before
a triangle is routed to the big list), the big list size, and the
stream capacity — the latter two scale adaptively when a frame reports
overflow (Draw re-renders with big_scale bumped).
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
    big_capacity: int = 256       # span-capacity-exceeding tris per batch
                                  # (generous: each adaptive big_scale
                                  # bump is a recompile — a frame hitch
                                  # worth avoiding; 256 rows is 128KB of
                                  # VMEM and absorbs the demo's worst
                                  # camera angle without a bump)
    big_scale: int = 1            # multiplier on big/clip capacity (adaptive)
    clip_capacity: int = 128      # eye-plane straddlers clipped per batch
                                  # (the demo orbit peaks at 72
                                  # straddlers when the camera skims the
                                  # terrain; overflow = recompile hitch)
    chunk: int = 16               # entries per inner eval block. The
                                  # curve is U-shaped per occupancy
                                  # (round-4 occupancy probe): small
                                  # chunks cut boundary-chunk waste at
                                  # sparse tiles, big ones amortize the
                                  # ~110-220 ns per-chunk fixed cost at
                                  # full segments — the demo adopted 32
                                  # (with tile_h 16), stress 64
    stream_window: int = 128      # coefficient rows per DMA window
                                  # (128 measured best at BOTH scales
                                  # in round 4: demo 7.91 ms vs 9.2
                                  # at 256 / 9.68 at 32, stress 76.8
                                  # vs 81.4 at 256 same-batch — big
                                  # windows pay a sparse-tile DMA-wait
                                  # tax, tiny ones per-DMA fixed cost)
    tiles_x: int = 1              # consecutive x-tiles per kernel
                                  # program (amortizing per-program
                                  # fixed costs measured NEUTRAL to
                                  # harmful on this hardware — kept as
                                  # a sweep knob, default off)
    bands: int = 1                # consecutive y-tiles (fine bins) per
                                  # kernel program, iterated by an
                                  # in-kernel fori loop (NOT unrolled,
                                  # unlike tiles_x): bins/evaluates at
                                  # tile_h granularity while per-
                                  # program fixed costs amortize x bands
    stream_factor: float = 2.0    # stream capacity = factor * T rows
                                  # (live incidences are ~1.3-1.7 per
                                  # triangle; dead K*T slack sorts to the
                                  # tail and is NOT gathered — XLA row
                                  # gathers cost ~25-45 ns/row, the
                                  # dominant frame cost at megatriangle
                                  # scale. Overflow -> adaptive bump.)
    auto_span: bool = True        # scale the span budget with the tile
                                  # grid (see _span_budget); False pins
                                  # it to max_tiles_per_tri exactly
    # PRUNED knobs (round 4, VERDICT r3 lever 5): ``subtiles`` (row-
    # strip binning/eval, built round 3) and ``packed_stream`` (4
    # records per 128-lane stream row) were measured net-negative on
    # hardware in every configuration — packed_stream ~40x (VPU
    # serialization on single-lane unpacks), subtiles 2-6x even after
    # round 4 fixed its big-list routing to tile-granularity spans and
    # gave it a laddered candidate enumeration (stress tile8: SB=2
    # 165 ms, SB=4 471 ms vs 79 ms default, BASELINE.md round 4). The
    # code was carrying a 4-way compatibility matrix through the hot
    # kernel for paths nothing should enable; both were removed — see
    # git history (<= round-4 commits) to resurrect, and BASELINE.md
    # for the measurements and the routing/ladder design notes.
    interpret: bool = False      # Pallas interpreter (CPU testing)


DEFAULT_CONFIG = RasterConfig()


def auto_config(width: int, height: int,
                triangles: int | None = None) -> RasterConfig:
    """Resolution/occupancy-adaptive RasterConfig: the default when no
    explicit config is set. The reference rasterizes at any window size
    with no knob (``Renderer/Surface.zig:76-94``); these thresholds
    reproduce that posture from the round-4/5 hardware sweeps instead
    of hand-pinning per app (VERDICT r4 #1).

    The selector is mean pixels-per-triangle = W*H / T — the one
    statically known quantity that tracks per-tile segment fill:

    - px/tri < 32 (megatriangle regime; the 4K/1M stress sits at 8):
      8-row tiles cut the kernel's per-entry lane waste at sub-pixel
      triangle sizes, chunk 64 fits the fat segments (round-4 chunk
      sweep: 76.4/76.9 vs 79.3-79.9 ms anchors), and stream_factor 1.6
      trims dead gather slack (round-3 occupancy analysis + sweep:
      79.3 vs 84.8 ms).
    - demo-class scenes: tile side grows ~ sqrt(px/tri) — doubling the
      tile doubles segment fill while the segments stay full, halving
      program count and binning candidates (round-4 batches 10-14,
      round-5 batch 15): 1080p demo (103 px/tri) -> t16 [ledger 3.66
      vs 7.04 ms at t8, and t32 LOSES: 4.08], 4K (415) -> t32 [10.6 vs
      11.2 t16, same batch], 8K (1660) -> t32/t64 [43.3 at t32 vs 65.2
      t16 same batch; t64 threshold measured in batch 15].
      chunk 32 matches the ~20-44-row segments this tiling yields (the
      U-curve: occupancy probe c16 1.66 / c32 1.43 / c64 1.87 us/tile).

    stream_window 128 is universal (round-4 batch 6/7 sweeps, both
    scales). Degenerate/unknown T falls back to the demo-class mapping
    at 512 px/tri.

    t64 is the CEILING, not just the 8K winner: t128c32 at 8K fails to
    compile — the kernel's scoped-VMEM stack hits 16.20M against the
    16.00M v5e limit (round-5 batch 17) — so the sqrt(px/tri) trend
    terminates at the hardware and no higher branch should be added."""
    px_per_tri = ((width * height / triangles)
                  if triangles else 512.0)
    if px_per_tri < 32.0:
        return RasterConfig(tile_h=8, chunk=64, stream_window=128,
                            stream_factor=1.6)
    if px_per_tri < 256.0:
        tile_h = 16
    elif px_per_tri < 1024.0:
        tile_h = 32
    else:
        tile_h = 64
    return RasterConfig(tile_h=tile_h, chunk=32, stream_window=128)

RASTER_FLAG_HELP = ("RasterConfig override 'th,tw,chunk,window[,tiles_x"
                    "[,span_budget[,bands[,RESERVED[,sf10]]]]]' "
                    "(kernel tuning sweeps; span_budget 0 keeps auto; "
                    "sf10 = stream_factor in tenths, e.g. 15 -> 1.5; "
                    "slot 8 was subtiles — pruned round 4, must be 0)")


def config_from_flag(spec: str) -> RasterConfig:
    """Parse the apps' shared ``--raster`` sweep flag (see
    RASTER_FLAG_HELP). Zero values in optional slots keep the
    RasterConfig default, so later slots can be set positionally
    without committing earlier ones (tiles_x excepted: its slot always
    binds because 0 is not a legal value)."""
    vals = [int(v) for v in spec.split(",")]
    th, tw, chunk, window = vals[:4]
    if len(vals) > 7 and vals[7]:
        raise ValueError("subtiles (slot 8) was pruned in round 4 "
                         "(measured net-negative everywhere; "
                         "BASELINE.md) — pass 0")
    if len(vals) > 9 and vals[9]:
        raise ValueError("packed_stream (slot 10) was pruned in round "
                         "4 (measured ~40x net-negative; BASELINE.md)")
    return RasterConfig(
        tile_h=th, tile_w=tw, chunk=chunk, stream_window=window,
        # tiles_x defaults to the RasterConfig default (1): multi-tile
        # programs measured neutral-to-harmful (BASELINE.md lever 2)
        # and must be opted into explicitly via the 5th value
        tiles_x=vals[4] if len(vals) > 4 else 1,
        **({"max_tiles_per_tri": vals[5], "auto_span": False}
           if len(vals) > 5 and vals[5] else {}),
        **({"bands": vals[6]} if len(vals) > 6 and vals[6] else {}),
        **({"stream_factor": vals[8] / 10.0}
           if len(vals) > 8 and vals[8] else {}))


def _cdiv(a: int, b: int) -> int:
    return (a + b - 1) // b


def _span_budget(T: int, NT: int, cfg: RasterConfig) -> int:
    """Effective span budget: bbox tiles before a triangle routes to the
    shared big list. ``cfg.max_tiles_per_tri`` is the floor; with
    ``auto_span`` the budget scales with the tile-grid size (sqrt of
    tile count — pixel spans grow with the frame SIDE, not its area),
    capped by a fixed candidate-array budget (2^23 entries) so
    megatriangle scenes keep their K*T sort cheap, and by 64. Fixes the
    resolution cliff where an 8K frame routed every demo triangle to the
    shared big list and each tile scanned all of them (855 ms/frame,
    BASELINE.md 8K smoke) — the reference rasterizes at any window size
    (``Renderer/Surface.zig:76-94``)."""
    K = cfg.max_tiles_per_tri
    if not cfg.auto_span:
        return K
    k_res = int(K * max(1.0, (NT / 512.0) ** 0.5) + 0.999)
    k_budget = (1 << 23) // max(T, 1)
    return max(K, min(k_res, max(K, k_budget), 64))


def _big_geometry(cfg: RasterConfig) -> tuple[int, int]:
    """(big capacity, chunk) honoring VMEM sublane alignment: chunk is a
    multiple of 8 and divides the (rounded-up) big capacity."""
    B = cfg.big_capacity * cfg.big_scale
    chunk = min(cfg.chunk, _cdiv(B, 8) * 8)
    return _cdiv(B, chunk) * chunk, chunk


# ---------------------------------------------------------------------------
# binning (XLA): CSR offsets + pre-gathered row stream
# ---------------------------------------------------------------------------

def viewport_bbox(tri_clip, width: int, vp_height: int):
    """Per-triangle pixel-space bounding box — (min_u, max_u, min_v,
    max_v) as four flat f32[T] vectors in FULL-viewport coordinates
    (unfloored/unclipped; band offsets apply inside binning). This is
    the ONLY thing binning needs from clip positions, so the frame
    program computes it per batch and concatenates four flat vectors
    instead of [T, 3, 4] interleaved corner arrays (whose concats
    lower to lane-hostile relayout copies — BASELINE.md round-3
    lever 4)."""
    if isinstance(tri_clip, rc.PlanarTris):
        us, vs = [], []
        for k in range(3):
            w = jnp.maximum(tri_clip.clip[k][3], rc.W_EPS)   # [T]
            us.append((0.5 * tri_clip.clip[k][0] / w + 0.5) * width)
            vs.append((0.5 - 0.5 * tri_clip.clip[k][1] / w) * vp_height)
        return (jnp.minimum(jnp.minimum(us[0], us[1]), us[2]),
                jnp.maximum(jnp.maximum(us[0], us[1]), us[2]),
                jnp.minimum(jnp.minimum(vs[0], vs[1]), vs[2]),
                jnp.maximum(jnp.maximum(vs[0], vs[1]), vs[2]))
    w = jnp.maximum(tri_clip[..., 3], rc.W_EPS)          # [T, 3]
    u = (0.5 * tri_clip[..., 0] / w + 0.5) * width
    v = (0.5 - 0.5 * tri_clip[..., 1] / w) * vp_height
    return (u.min(1), u.max(1), v.min(1), v.max(1))


def bin_triangles(tc: rc.TriCoeffs, tri_clip: jax.Array, height: int,
                  width: int, cfg: RasterConfig, y0=0,
                  vp_height: int | None = None):
    """CSR-bin triangles to tiles.

    Returns (stream f32[S, 128], starts i32[NT], counts i32[NT],
    big_rows f32[1, B, LANES], big_count i32[1], big_touch i32[NT],
    overflow bool[2] = (stream capacity, big list)). S =
    ``stream_factor * big_scale * T`` rounded up to whole
    ``stream_window`` rows (capped at the K*T worst case), split evenly
    across the row groups (split-frame binning — see the fast-path
    comment below): every triangle-tile incidence with span <= K gets a
    stream row (its packed coefficient record, gathered here so the
    kernel streams contiguously). Live incidences sort ahead of the
    dead slack, so the gather — the dominant megatriangle cost at
    ~25-45 ns/row — touches only S rows; a group with more live
    incidences than its capacity raises the stream overflow flag (the
    overflowing frame clamps tail tiles' counts; Draw bumps capacity
    and re-renders).

    ``y0``/``vp_height`` support band rendering (the multi-chip row
    shards): the viewport transform always uses the FULL frame height
    ``vp_height``, while the tile grid covers rows [y0, y0 + height).
    ``y0`` may be a traced scalar (each shard binds its own offset).
    Triangles whose bbox misses the band are CULLED before binning
    (``bin_packed``'s band-local cull, round 5) so per-device stream
    entries scale with band content; the kernel's global-coordinate
    coverage test remains the exactness backstop for the survivors."""
    vp_height = height if vp_height is None else vp_height
    return bin_packed(rc.pack_coeffs_full(tc), tc.valid,
                      viewport_bbox(tri_clip, width, vp_height),
                      height, width, cfg, y0=y0, vp_height=vp_height)


def bin_packed(packed: jax.Array, valid: jax.Array, bbox, height: int,
               width: int, cfg: RasterConfig, y0=0,
               vp_height: int | None = None):
    """:func:`bin_triangles` on pre-packed inputs: ``packed``
    f32[T, FULL_LANES] coefficient records (``rc.pack_coeffs_full``,
    id lane already base-offset for concatenated multi-batch frames),
    ``valid`` bool[T] post-setup validity, ``bbox`` the
    :func:`viewport_bbox` tuple. This is the frame program's entry: the
    per-batch setup/pack stage concatenates flat vectors and [T, 32]
    row blocks only, never interleaved corner arrays."""
    vp_height = height if vp_height is None else vp_height
    y0 = jnp.asarray(y0, jnp.float32)
    nty = _cdiv(height, cfg.tile_h)
    ntx = _cdiv(width, cfg.tile_w)      # tile columns (= kernel grid)
    NT = nty * ntx                      # bins == kernel tiles
    B, _chunk = _big_geometry(cfg)
    W = cfg.stream_window
    T = valid.shape[0]

    def bin_of(ty, tx):
        """Global bin id of (tile row ``ty``, tile column ``tx``)."""
        return ty * ntx + tx

    # band-local cull: a triangle whose viewport bbox misses the band's
    # pixel rows [y0, y0 + height) — or the frame's columns — can cover
    # no pixel here (coverage is pixel-center-inside, a subset of the
    # bbox), so it must not become a border-tile candidate. Without
    # this, the clamps below turn every out-of-band triangle into live
    # border-tile stream/big entries that each of N multi-chip devices
    # sorts, gathers and kernel-evaluates only to reject per-pixel —
    # per-device binning+raster work stayed O(T) regardless of the
    # band (round-4 VERDICT weak #2). Flat [T] compares; parity is
    # exact because culled entries were only ever rejected by the
    # kernel's global-coordinate coverage test. Single-device frames
    # (y0=0, height=vp_height) get the same cull for free for
    # off-screen triangles. NaN bboxes compare False and cull — such a
    # triangle has NaN coverage math and shades nothing either way.
    valid = (valid & (bbox[3] >= y0) & (bbox[2] < y0 + height)
             & (bbox[1] >= 0.0) & (bbox[0] < width))

    minx = jnp.clip(jnp.floor(bbox[0]), 0, width - 1)
    maxx = jnp.clip(jnp.ceil(bbox[1]), 0, width - 1)
    miny = jnp.clip(jnp.floor(bbox[2]) - y0, 0, height - 1)
    maxy = jnp.clip(jnp.ceil(bbox[3]) - y0, 0, height - 1)

    tx0 = (minx / cfg.tile_w).astype(jnp.int32)
    tx1 = (maxx / cfg.tile_w).astype(jnp.int32)
    ty0 = (miny / cfg.tile_h).astype(jnp.int32)
    ty1 = (maxy / cfg.tile_h).astype(jnp.int32)
    sx = tx1 - tx0 + 1
    sy = ty1 - ty0 + 1
    span = sx * sy                                     # [T]

    K = _span_budget(T, NT, cfg)
    small = valid & (span <= K)
    big = valid & jnp.logical_not(small)

    # Candidate tiles, row-major over each triangle's bbox tile rect —
    # COMPRESSED by span class at megatriangle scale. A dense [K, T]
    # candidate grid sorts K*T keys while live incidences run ~1.3-1.7
    # per triangle when the median bbox is ~2 px^2: ~80% of the sorted
    # elements are dead padding, and the TPU sort is a data-oblivious
    # sorting network so dead elements cost exactly as much as live
    # ones. Classes:
    #   A: slot 0 (first bbox tile), every small triangle      -> [T]
    #   B: slot 1 (second bbox tile), triangles with span >= 2 -> [T]
    #   C: slots 2..K-1, triangles with span >= 3, COMPACTED to a
    #      static capacity c (few at megatriangle scale; overflow
    #      rides the stream lane and triggers the adaptive bump)
    #                                                     -> [K-2, c]
    # Total sorted elements: 2T + (K-2)c ~ 2.75T vs KT = 8T at the
    # 4K/1M stretch (101.6 -> 93.9 ms/frame measured). At SMALL scenes
    # the compaction capacity is a large fraction of T (demo: c = 16384
    # vs T = 20k) so the compressed grid is barely smaller than dense
    # while adding a sort + padded gather + dynamic-divisor rect decode
    # (demo 1080p measured 7.8 -> 10.5 ms): compression only engages
    # when c <= T/4, else the dense grid below.
    tri_idx = jnp.arange(T, dtype=jnp.int32)
    sxr = jnp.maximum(sx, 1)                           # [T]
    overflow_c = jnp.zeros((), bool)
    c = _cdiv(max(min(T, 2**14), (T // 8) * cfg.big_scale), 128) * 128
    if K >= 3 and c <= T // 4:
        tile0 = bin_of(ty0, tx0)
        parts_tile = [jnp.where(small, tile0, NT)]
        parts_tri = [tri_idx]
        # slot 1: (tx0+1, ty0) when the bbox is >= 2 tiles wide, else
        # (tx0, ty0+1) — row-major rank 1 of the (tile row x col) rect
        tile_b = jnp.where(sx >= 2, tile0 + 1, bin_of(ty0 + 1, tx0))
        parts_tile.append(jnp.where(small & (span >= 2), tile_b, NT))
        parts_tri.append(tri_idx)
        # compact span>=3 triangles: their (ty0, tx0, sx, span) rows
        # gather from a 128-lane-padded i32 table (narrow-row gathers
        # hit a ~5x slower path; the barrier pins the pad ahead of the
        # gather, same trick as the coefficient stream below)
        wide = small & (span >= 3)
        order = jnp.where(wide, tri_idx, T)
        csel = jnp.sort(order, stable=False)
        if T < c:
            csel = jnp.concatenate([csel, jnp.full(c - T, T, jnp.int32)])
        csel = csel[:c]
        c_live = csel < T
        overflow_c = wide.sum(dtype=jnp.int32) > c
        csel = jnp.minimum(csel, max(T - 1, 0))
        binfo = lax.optimization_barrier(jnp.pad(
            jnp.stack([ty0, tx0, sxr, span], axis=1), ((0, 0), (0, 124))))
        rows = binfo[csel]                             # [c, 128] i32
        cty0, ctx0 = rows[:, 0][None, :], rows[:, 1][None, :]
        csx, cspan = rows[:, 2][None, :], rows[:, 3][None, :]
        eK = jnp.arange(2, K, dtype=jnp.int32)[:, None]    # [K-2, 1]
        ey = eK // csx                                     # [K-2, c]
        ex = eK - ey * csx
        ctile = bin_of(cty0 + ey, ctx0 + ex)
        c_ok = c_live[None, :] & (eK < cspan)
        parts_tile.append(jnp.where(c_ok, ctile, NT).reshape(-1))
        parts_tri.append(jnp.broadcast_to(csel[None, :],
                                          (K - 2, c)).reshape(-1))
    else:
        # dense [K, T] candidate grid — K on SUBLANES, T on lanes (a
        # [T, K] layout leaves 120 of 128 vector lanes dead, measured
        # ~0.8 ms per elementwise op at 1M triangles); the bin sort is
        # order-oblivious so the K-major flattening is free
        eK = jnp.arange(K, dtype=jnp.int32)[:, None]   # [K, 1]
        ey = eK // sxr[None, :]                        # [K, T]
        ex = eK - ey * sxr[None, :]
        tile = bin_of(ty0[None, :] + ey, tx0[None, :] + ex)
        live = small[None, :] & (eK < span[None, :])
        parts_tile = [jnp.where(live, tile, NT).reshape(-1)]
        parts_tri = [jnp.broadcast_to(tri_idx[None, :],
                                      (K, T)).reshape(-1)]

    # sort incidences by (tile, tri): per-tile contiguity, ascending
    # submission order within a tile; dead incidences (tile == NT) sort
    # to the tail past every real tile's segment.
    #
    # Fast path: one fused unique 32-bit key per ROW GROUP. The frame's
    # tile rows are split into F contiguous groups, each with its own
    # key space, stream segment and SINGLE-OPERAND sort (measured
    # several x faster per element than a variadic two-key sort) — so
    # 8-row tiles fit u32 keys even at 4K with a megatriangle batch
    # (split-frame binning, BASELINE.md round-3 lever 1). Contiguous
    # row-ranges keep global tile order == concatenation of group
    # orders, so the kernel's CSR contract is untouched. The variadic
    # two-key sort remains the fallback for key spaces beyond F=8
    # groups (no hard wall).
    tile_flat = (jnp.concatenate(parts_tile) if len(parts_tile) > 1
                 else parts_tile[0])
    tri_flat = (jnp.concatenate(parts_tri) if len(parts_tri) > 1
                else parts_tri[0])
    NC = int(tile_flat.shape[0])       # total candidates (was K*T dense)
    tile_range = jnp.arange(NT, dtype=jnp.int32)

    # Stream capacity: dead incidence slots sort to the tail past every
    # live entry, so only the first S rows of each group need gathering
    # — and XLA row gathers (~25-45 ns/row, layout-independent) are the
    # single most expensive op at megatriangle scale, so the capacity is
    # a REAL capacity (factor * T, adaptively scaled), not the K*T worst
    # case. On overflow the tail tiles' counts clamp (one frame drops
    # those triangles, like big-list overflow) and the flag triggers
    # Draw's bump + re-render.
    # floor of 128k entries: below that the gather is sub-ms anyway and
    # small scenes (whose triangles are large relative to the tile grid,
    # spans 3-8) must not need adaptive bumps just to fit the stream
    S_total = min(max(_cdiv(int(T * cfg.stream_factor * cfg.big_scale),
                            W),
                      _cdiv(min(NC, 2**17), W), 1),
                  _cdiv(NC, W)) * W
    # test hook: pin the stream capacity (scaled by the adaptive
    # big_scale so the overflow -> bump -> re-render ladder can
    # recover) — the min(NC, 2**17) floor above makes real small
    # scenes structurally overflow-free, so the e2e bump path needs
    # a starved capacity injected
    _rows = globals().get("_FORCE_STREAM_ROWS")
    if _rows:
        S_total = _cdiv(_rows * cfg.big_scale, W) * W

    # pre-gather the stream: coefficient rows in bin order, in whole DMA
    # windows, one entry per 128-lane stream row (Mosaic requires manual
    # HBM DMA slices to be 128-lane aligned, so a [S, 32] stream could
    # not be windowed anyway).
    # the gather must read full 128-lane rows: XLA row gathers from a
    # [T, 128] table run ~5x faster per row than from [T, 32] (narrow
    # rows hit a slow sublane path). 4x the logical bytes, but the
    # gather is row-overhead-bound, not bandwidth-bound. Callers MAY
    # pack wide (pack_coeffs_full(lanes=128)) to skip the pad op — but
    # the frame program deliberately packs NARROW: wide packing was
    # measured net-negative on hardware (round-4 batch 8: XLA builds
    # the wide table as a 22.9 ms 128-column concatenate at 4K/1M vs
    # the 3.2 ms pad it replaces — see draw.py _setup_batch). The
    # optimization_barrier is load-bearing either way: without it XLA
    # commutes the pad/zeros-concat past the gather ("gather less
    # data") and the slow narrow gather comes back — measured 93 ms vs
    # ~15 ms per stress frame.
    packed128 = lax.optimization_barrier(
        packed if packed.shape[1] == 128
        else jnp.pad(packed, ((0, 0), (0, 128 - packed.shape[1]))))

    def gather_stream(idx):
        """Bin-order coefficient stream from the 128-lane-padded table
        (wide SOURCE rows gather ~5x faster than narrow ones —
        BASELINE.md): one padded record per stream row ([S, 128], 3/4
        of the bytes are pad — the gather is row-overhead bound, not
        bandwidth bound, so the pad is free throughput-wise)."""
        return packed128[idx]

    def group_space(rows: int) -> int:
        return (rows * ntx + 1) * (T + 1)

    F = 1
    while F < min(nty, 32) and group_space(_cdiv(nty, F)) >= 2**32:
        F += 1
    # test hook: pin the group count so small scenes exercise the
    # multi-group path (real frames only split at huge NT x T)
    F = min(globals().get("_FORCE_ROW_GROUPS") or F, nty)
    rpg = _cdiv(nty, F)                 # tile rows per group

    if group_space(rpg) < 2**32 and \
            not globals().get("_FORCE_TWO_KEY_SORT"):
        # u32 keys when the i32 range is too small (16-row tiles at 4K)
        dt = jnp.int32 if group_space(rpg) < 2**31 else jnp.uint32
        Sg = _cdiv(_cdiv(S_total, F), W) * W     # capacity per group
        starts_l, counts_l, streams, live_l = [], [], [], []
        for g in range(F):
            base = g * rpg * ntx
            ntg = min(rpg, nty - g * rpg) * ntx
            if ntg <= 0:     # ceil split: only trailing groups can be
                break        # empty; they own no tiles and no stream
            in_g = (tile_flat >= base) & (tile_flat < base + ntg)
            # dead entries (other groups / unbinned) take the virtual
            # tile ntg, keeping the tri id in the low bits: they sort
            # past every live segment in ascending tri order, so the
            # stream's dead slack is deterministic (and identical to
            # the two-key fallback's)
            ltile = jnp.where(in_g, tile_flat - base, ntg)
            keys = jnp.sort(ltile.astype(dt) * dt(T + 1)
                            + tri_flat.astype(dt), stable=False)
            # CSR bounds: ends[t] == starts[t+1] (tile segments are
            # adjacent), so ONE bounds vector serves both, and
            # bounds[ntg] = the live count. Two routes:
            #  - compare-histogram: counts[t] = #candidates with
            #    ltile == t as a broadcast compare-reduce over the
            #    UNSORTED candidates + exclusive cumsum. One fused
            #    vector pass, independent of the sort, much cheaper
            #    than any searchsorted lowering at demo scale
            #    (searchsorted 'scan' lowers to a while loop, ~1.1
            #    ms/frame on a 2k-tile grid; method='sort' merges via
            #    a variadic sort, measured just as bad, ~1.2 ms).
            #  - searchsorted 'scan' when bins x candidates explodes
            #    (megatriangle scenes: the while loop's ~2k iterations
            #    amortize over millions of keys just fine).
            if NC * ntg <= 2**29:
                bins = jnp.arange(ntg, dtype=jnp.int32)
                hist = (ltile[None, :] == bins[:, None]).sum(
                    axis=1, dtype=jnp.int32)
                bounds = jnp.concatenate(
                    [jnp.zeros(1, jnp.int32), jnp.cumsum(hist)])
            else:
                lrange = jnp.arange(ntg + 1, dtype=jnp.int32)
                bounds = jnp.searchsorted(
                    keys, lrange.astype(dt) * dt(T + 1),
                    method="scan").astype(jnp.int32)
            lstarts = bounds[:-1]
            lends = bounds[1:]
            live_l.append(bounds[-1])
            lends = jnp.minimum(lends, Sg)
            lstarts = jnp.minimum(lstarts, Sg)
            keys_cap = keys[:Sg]
            if keys_cap.shape[0] < Sg:
                keys_cap = jnp.pad(keys_cap,
                                   (0, Sg - keys_cap.shape[0]))
            # decode AFTER slicing to the capacity: %-decoding all K*T
            # keys costs several redundant megaslices per frame
            ids = jnp.clip((keys_cap % dt(T + 1)).astype(jnp.int32),
                           0, max(T - 1, 0))
            streams.append(ids)
            starts_l.append(lstarts + g * Sg)
            counts_l.append(lends - lstarts)
        starts = jnp.concatenate(starts_l) if F > 1 else starts_l[0]
        counts = jnp.concatenate(counts_l) if F > 1 else counts_l[0]
        # concat the (cheap i32) indices and run ONE row gather for all
        # groups: gathering per group then concatenating [Sg, 128] f32
        # streams costs a full extra stream-sized copy (measured 3.2 ms
        # at 4K/1M with F=2)
        idx_all = jnp.concatenate(streams) if F > 1 else streams[0]
        stream = gather_stream(idx_all)
        overflow_stream = (jnp.stack(live_l).max() > Sg) | overflow_c
    else:
        tile_sorted, tri_sorted2 = lax.sort((tile_flat, tri_flat),
                                            num_keys=2)
        starts = jnp.searchsorted(tile_sorted, tile_range).astype(
            jnp.int32)
        ends = jnp.searchsorted(tile_sorted, tile_range + 1).astype(
            jnp.int32)
        S = S_total
        live_total = ends[NT - 1] if NT > 0 else jnp.int32(0)
        overflow_stream = (live_total > S) | overflow_c
        ends = jnp.minimum(ends, S)
        starts = jnp.minimum(starts, S)
        counts = ends - starts                         # [NT]
        idx_cap = tri_sorted2[:S]
        if idx_cap.shape[0] < S:   # S rounded past K*T
            idx_cap = jnp.pad(idx_cap, (0, S - idx_cap.shape[0]))
        stream = gather_stream(idx_cap)                # [S(/4), 128]

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
    big_rows = packed[big_ids][None]            # [1, B, packed lanes]

    # per-TILE flag (kernel-grid granularity, not bin granularity):
    # does ANY big triangle's bbox touch the tile? lets the kernel skip
    # the big loop entirely on untouched tiles
    slotv = jnp.arange(B, dtype=jnp.int32)
    big_live = slotv < big_count                       # [B]
    btx0, btx1 = tx0[big_ids], tx1[big_ids]
    bty0, bty1 = ty0[big_ids], ty1[big_ids]               # tile rows
    tile_range_t = jnp.arange(nty * ntx, dtype=jnp.int32)
    t_y = tile_range_t // ntx
    t_x = tile_range_t % ntx
    hit = ((t_x[:, None] >= btx0[None, :]) & (t_x[:, None] <= btx1[None, :])
           & (t_y[:, None] >= bty0[None, :]) & (t_y[:, None] <= bty1[None, :])
           & big_live[None, :])                        # [nty*ntx, B]
    big_touch = hit.any(axis=1).astype(jnp.int32)

    return stream, starts, counts, big_rows, big_count[None], \
        big_touch, jnp.stack([overflow_stream, overflow_big])


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _raster_kernel(y0_ref, starts_ref, counts_ref, big_count_ref,
                   big_touch_ref, stream_hbm, big_ref,
                   depth_in_ref, fused_ref, winner_ref,
                   stream_scratch, dma_sems, resident_ref,
                   *, tile_h: int, tile_w: int,
                   chunk: int, window: int, tiles_x: int, ntx: int,
                   bands: int = 1):
    """One program = ``bands`` consecutive (tile_h, tile_w) fine tiles
    along y (an in-kernel fori loop — per-program fixed costs and
    in/out block DMAs amortize across bands WITHOUT unrolling the body,
    which is what made multi-tile ``tiles_x`` programs spill) times
    ``tiles_x`` consecutive tiles along x (unrolled; kept as a sweep
    knob, default 1).

    Per fine tile: stream its CSR segment of the pre-gathered
    coefficient-row stream in ``window``-row DMA windows (window
    boundaries are fixed multiples of ``window`` in the global stream,
    so transfers are always aligned), double-buffered: window b+1
    transfers while window b evaluates, and each tile's epilogue
    prefetches the first window of the next tile IN PROCESSING ORDER
    (next band, next x-tile, or next program) into the buffer it will
    look in. ``resident_ref`` (SMEM scalar) holds the global index of
    the window most recently waited on: CSR segments are adjacent, so
    consecutive tiles usually share a boundary window, and the sharing
    tile skips both the re-transfer (epilogue gate) and the re-wait
    (loop gate) — the data is still in its slot, transfers and waits
    stay exactly paired (each started window is waited exactly once by
    the first tile that needs it). Rows are evaluated in ``chunk``-row
    sub-blocks as
    (G, THW) outer-product FMAs with a min-reduce depth resolve
    (lowest-id tie-break == submission-order 'less' semantics).

The winner's varying-plane COEFFICIENTS are recovered per chunk
    with an at-most-one-nonzero-per-output matmul on the (otherwise
    idle) MXU — exactly ONE row wins per pixel, so the fp32-precision
    contraction reproduces the winning row's f32 plane value exactly."""
    THW = tile_h * tile_w
    G = chunk
    W = window
    R = tiles_x
    B = bands
    ty_c = pl.program_id(0)
    txg = pl.program_id(1)
    nty_c = pl.num_programs(0)

    # window-residency cursor: global index of the window whose data is
    # valid in slot (resident % 2), or -1 before any wait. Scratch
    # persists across the sequential grid, so the value carries between
    # programs just like the double-buffer windows themselves.
    @pl.when((ty_c == 0) & (txg == 0))
    def _():
        resident_ref[0] = -1

    def window_dma(blk, slot):
        return pltpu.make_async_copy(
            stream_hbm.at[pl.ds(blk * W, W), :],
            stream_scratch.at[slot], dma_sems.at[slot])

    r_iota = lax.broadcasted_iota(jnp.int32, (G, 1), 0)
    flat = lax.broadcasted_iota(jnp.int32, (1, THW), 1)

    def tile_body(r, tx, px, b):
        """Rasterize fine tile (ty_c*B + b, tx); b is a python int when
        B == 1 (static slicing) and a fori counter otherwise."""
        fy = ty_c * B + b
        t = fy * ntx + tx
        # y0: global row of the frame band's first row (multi-chip row
        # shards); coverage/depth math runs in GLOBAL pixel coordinates
        py_full = ((flat // tile_w) + fy * tile_h + y0_ref[0]).astype(
            jnp.float32) + 0.5

        start = starts_ref[t]
        end = start + counts_ref[t]
        n = end - start
        # skip the shared big-triangle loop on untouched tiles
        nbig = jnp.where(big_touch_ref[t] > 0, big_count_ref[0], 0)

        def eval_block(sub, live, carry):
            """sub: (g, >= LANES) coefficient rows — a (G, 128)
            stream window slice or the (g, 32) big-list rows.
            live: (g, 1) slot mask. Coefficients are consumed as
            single-lane slices (cheap at any static lane offset)."""
            py = py_full
            depth, winner, nums, den = carry
            g = sub.shape[0]

            def lane(k):
                return sub[:, k:k + 1]

            scalars = tuple(lane(k) for k in range(rc.COEFF_LANES))
            # live/validity fold into the edge threshold: no (g, THW)
            # mask ANDs in the inner loop (see coverage_depth)
            cov, z = rc.coverage_depth(scalars, px, py,
                                       row_mask=live)      # (g, THW)
            # sentinel must exceed ANY representable depth (layer-
            # biased merged passes go beyond 1.0)
            zm = jnp.where(cov, z, jnp.float32(jnp.inf))
            ids = jnp.broadcast_to(lane(16), zm.shape)
            zmin = jnp.min(zm, axis=0, keepdims=True)      # (1, THW)
            idmin = jnp.min(jnp.where(zm == zmin, ids,
                                      jnp.float32(3e38)),
                            axis=0, keepdims=True)
            idw = idmin.astype(jnp.int32)
            # 'less' depth test with lowest-id tie-break ACROSS chunks:
            # equal-depth pixels keep the lowest triangle id, i.e.
            # submission order — exactly the sequential oracle's
            # semantics — regardless of the order entries reach this
            # tile (binned vs big list vs clipped appendees). Uncovered
            # pixels hold winner -1, so a tie against the clear depth
            # never wins (idw >= 0 > -1 is the wrong side of <).
            win = (zmin < depth) | ((zmin == depth) & (idw < winner))

            # varying planes of the winning row (exactly one matches).
            # The winner's plane COEFFICIENTS are recovered with one
            # (g, 16) x (g, THW) MXU dot instead of five masked
            # (g, THW) VPU sum-reduces: exactly ONE row of ``wf`` is
            # nonzero per pixel lane, so every other term of the dot's
            # reduction is an exact f32 0.0 and any reduction order/
            # precision reproduces the winning row's coefficient bits. The
            # plane value is then the SAME a*px + b*py + c expression
            # as before, on the same coefficient bits — bit-identical
            # output, ~25 fewer (g, THW) vector ops per chunk.
            is_win_row = cov & (zm == zmin) & (ids == idmin)
            wf = is_win_row.astype(jnp.float32)
            cf = sub[:, 16:32]                             # id + 5 planes
            # precision=HIGHEST is LOAD-BEARING on hardware: it is the
            # only setting Mosaic lowers as fp32 contraction
            # (#tpu.contract_precision<fp32>); the default truncates the
            # f32 coefficient operand to bf16 on the MXU, silently
            # shaving ~16 mantissa bits off every recovered varying
            # plane (ADVICE r3). With the exact 0/1 wf operand, HIGHEST
            # reproduces the winning row's coefficient bits exactly.
            wc = lax.dot_general(cf, wf, (((0,), (0,)), ((), ())),
                                 precision=lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)

            def plane(ka, kb, kc):
                # ka/kb/kc are record-relative lanes; wc row = lane - 16
                return (wc[ka - 16:ka - 15] * px
                        + wc[kb - 16:kb - 15] * py
                        + wc[kc - 16:kc - 15])

            den_c = plane(17, 18, 19)
            nums_c = tuple(plane(20 + 3 * ch, 21 + 3 * ch, 22 + 3 * ch)
                           for ch in range(4))

            return (jnp.where(win, zmin, depth),
                    jnp.where(win, idw, winner),
                    tuple(jnp.where(win, nc, old)
                          for nc, old in zip(nums_c, nums)),
                    jnp.where(win, den_c, den))

        # --- binned triangles: double-buffered stream windows ----------
        # one entry per 128-lane stream row (lanes [COEFF..128) = pad);
        # a window is W rows
        blk0 = lax.div(start, W)
        nblk = jnp.where(n > 0, lax.div(end - 1, W) + 1 - blk0, 0)

        # window 0 of the FIRST nonempty tile has no predecessor to
        # prefetch it; every later tile's window 0 is prefetched by
        # the previous tile's epilogue (below)
        @pl.when((t == 0) & (nblk > 0))
        def _():
            window_dma(blk0, lax.rem(blk0, 2)).start()

        def block_body(b, carry, blk0=blk0, nblk=nblk, start=start,
                       end=end, eval_block=eval_block):
            blk = blk0 + b
            slot = lax.rem(blk, 2)

            @pl.when(b + 1 < nblk)
            def _():
                window_dma(blk + 1, lax.rem(blk + 1, 2)).start()

            # only the tile's FIRST window can already be resident (a
            # boundary window shared with the previous tile, which then
            # issued no transfer either — see the epilogue gate); later
            # windows always follow an in-loop start above.
            @pl.when(blk != resident_ref[0])
            def _():
                window_dma(blk, slot).wait()

            resident_ref[0] = blk

            wbase = blk * W
            # chunk sub-blocks at fixed window-aligned offsets:
            # boundary chunks carry dead slots masked by `live` (never
            # read past the window; G divides W)
            c0 = lax.div(jnp.maximum(start - wbase, 0), G)
            c1 = lax.div(jnp.minimum(end - wbase, W) + G - 1, G)

            def chunk_body(ci, carry):
                rows = stream_scratch[slot, pl.ds(ci * G, G), :]
                pos = wbase + ci * G + r_iota
                live = (pos >= start) & (pos < end)
                return eval_block(rows, live, carry)

            return lax.fori_loop(c0, c1, chunk_body, carry)

        boff = b * tile_h      # static when B == 1 (b is a python int)
        carry = (depth_in_ref[pl.ds(boff, tile_h),
                              r * tile_w:(r + 1) * tile_w]
                 .reshape(1, THW),
                 jnp.full((1, THW), -1, jnp.int32),
                 tuple(jnp.zeros((1, THW), jnp.float32)
                       for _ in range(4)),
                 jnp.ones((1, THW), jnp.float32))
        carry = lax.fori_loop(0, nblk, block_body, carry)

        # epilogue: prefetch the first window of the next tile IN
        # PROCESSING ORDER (next band of this program, next x-tile, or
        # band 0 of the next program — the grid iterates x fastest)
        # while this tile's big loop and output writes run. Scratch and
        # semaphores persist; buffer parity matches the next wait.
        fy0 = ty_c * B
        t_next = jnp.where(b + 1 < B, t + ntx,
                           jnp.where(tx + 1 < ntx,
                                     fy0 * ntx + tx + 1,
                                     (fy0 + B) * ntx))
        last = ((ty_c == nty_c - 1) & (tx == ntx - 1) & (b == B - 1))

        @pl.when(jnp.logical_not(last))
        def _():
            nstart = starts_ref[t_next]
            nn = counts_ref[t_next]
            nblk0 = lax.div(nstart, W)
            # skip the transfer when the next tile's first window is
            # already resident (CSR adjacency makes this the common
            # case at sparse scenes): the next tile's loop gate skips
            # the wait under the SAME resident value — resident_ref
            # cannot change between this read and that gate (empty
            # tiles in between never wait) — so starts and waits stay
            # exactly paired and the slot still holds the window's data
            # (in-tile prefetch never starts windows past the tile's
            # own last one, so nothing overwrote it).
            @pl.when((nn > 0) & (nblk0 != resident_ref[0]))
            def _():
                window_dma(nblk0, lax.rem(nblk0, 2)).start()

        # big triangles after binned ones (order-free: id tie-break)
        def big_chunk(ci, carry, nbig=nbig, eval_block=eval_block):
            sub = big_ref[0, pl.ds(ci * G, G), :]
            slot = r_iota + ci * G
            live = slot < nbig
            return eval_block(sub, live, carry)

        carry = lax.fori_loop(0, lax.div(nbig + G - 1, G), big_chunk,
                              carry)

        # fused f32 out lanes: [0]=depth, [1]=den, [2:6]=varying nums
        depth, winner, nums, den = carry
        fused_tile = jnp.concatenate(
            [depth.reshape(1, tile_h, tile_w),
             den.reshape(1, tile_h, tile_w)]
            + [nc.reshape(1, tile_h, tile_w) for nc in nums], axis=0)
        winner_tile = winner.reshape(tile_h, tile_w)
        fused_ref[:, pl.ds(boff, tile_h),
                  r * tile_w:(r + 1) * tile_w] = fused_tile
        winner_ref[pl.ds(boff, tile_h),
                   r * tile_w:(r + 1) * tile_w] = winner_tile

    for r in range(R):
        tx = txg * R + r
        px = ((flat % tile_w) + tx * tile_w).astype(jnp.float32) + 0.5
        if B == 1:
            tile_body(r, tx, px, 0)
        else:
            lax.fori_loop(
                0, B,
                lambda b, _, r=r, tx=tx, px=px: (tile_body(r, tx, px, b)
                                                 or 0),
                0)


def rasterize(tc: rc.TriCoeffs, height: int, width: int,
              depth: jax.Array | None = None,
              base_index: int = 0,
              tri_clip: jax.Array | None = None,
              cfg: RasterConfig | None = None,
              y0=0, vp_height: int | None = None):
    """Pallas fused rasterize pass (ONE pass for any triangle count —
    the coefficient stream lives in HBM, not VMEM).

    Returns (depth f32[H,W], winner i32[H,W], vary_num f32[4,H,W],
    vary_den f32[H,W], overflowed bool[2] = (stream capacity, big
    list)). The perspective-correct
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
    vp_height = height if vp_height is None else vp_height
    return rasterize_packed(
        rc.pack_coeffs_full(tc, base=base_index), tc.valid,
        viewport_bbox(tri_clip, width, vp_height), height, width,
        depth=depth, cfg=cfg, y0=y0, vp_height=vp_height)


def rasterize_packed(packed: jax.Array, valid: jax.Array, bbox,
                     height: int, width: int,
                     depth: jax.Array | None = None,
                     cfg: RasterConfig | None = None,
                     y0=0, vp_height: int | None = None):
    """:func:`rasterize` on pre-packed inputs (see :func:`bin_packed`).
    Triangle ids (winner indices, depth-tie ranks) come from the packed
    id lane, so concatenated multi-batch frames pack each batch with its
    global base offset (``rc.pack_coeffs_full(tc, base=...)``)."""
    cfg = cfg or DEFAULT_CONFIG
    vp_height = height if vp_height is None else vp_height
    if depth is None:
        depth = jnp.full((height, width), 1.0, jnp.float32)

    nty = _cdiv(height, cfg.tile_h)
    ntx = _cdiv(width, cfg.tile_w)
    B, chunk = _big_geometry(cfg)
    if cfg.chunk % 8:
        raise ValueError(f"chunk ({cfg.chunk}) must be a multiple of 8 "
                         "(sublane alignment of VMEM row slices)")
    W = cfg.stream_window
    if W % chunk or W % 8:
        raise ValueError(f"stream_window ({W}) must be a multiple of "
                         f"chunk ({chunk}) and of 8 (DMA sublane "
                         "alignment of the stream)")
    # bands: fine tiles per program along y (fori-looped in-kernel).
    # The fine-tile grid pads up to a whole number of programs; binning
    # runs on the padded grid so CSR indices and the kernel agree.
    BD = max(1, cfg.bands)
    nty = _cdiv(nty, BD) * BD
    ph, pw = nty * cfg.tile_h, ntx * cfg.tile_w

    (stream, starts, counts, big_rows, big_count, big_touch,
     ovf) = bin_packed(packed, valid, bbox, ph, width, cfg, y0=y0,
                       vp_height=vp_height)

    y0_arr = jnp.asarray(y0, jnp.int32).reshape(1)
    depth_p = jnp.pad(depth, ((0, ph - height), (0, pw - width)),
                      constant_values=1.0)

    # multi-tile programs: the largest divisor of the column count that
    # is <= cfg.tiles_x (so the grid tiles the frame exactly)
    R = max(r for r in range(1, max(cfg.tiles_x, 1) + 1) if ntx % r == 0)

    kernel = functools.partial(_raster_kernel, tile_h=cfg.tile_h,
                               tile_w=cfg.tile_w,
                               chunk=chunk, window=W, tiles_x=R,
                               ntx=ntx, bands=BD)
    tile_spec = pl.BlockSpec((BD * cfg.tile_h, R * cfg.tile_w),
                             lambda ty, tx: (ty, tx),
                             memory_space=pltpu.VMEM)
    # In interpret mode (CPU tests) the kernel is inlined into the
    # surrounding XLA program, so its f32 math can fuse with whatever
    # PRODUCED the inputs — two frame programs with different upstream
    # graphs (e.g. planar vs vmapped vertex stages) then make different
    # FMA/fusion decisions inside the kernel and depth wobbles by 1 ulp,
    # flipping depth-tie winners. Barriers cut producer/consumer fusion
    # so the kernel region compiles as a self-contained island: output
    # bits are a function of input bits only (matching real-TPU
    # behavior, where pallas_call is already a compilation boundary).
    if cfg.interpret:
        (y0_arr, starts, counts, big_count, big_touch, stream, big_rows,
         depth_p) = lax.optimization_barrier(
            (y0_arr, starts, counts, big_count, big_touch, stream,
             big_rows, depth_p))
    fused, winner = pl.pallas_call(
        kernel,
        grid=(nty // BD, ntx // R),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # y0
            pl.BlockSpec(memory_space=pltpu.SMEM),           # starts
            pl.BlockSpec(memory_space=pltpu.SMEM),           # counts
            pl.BlockSpec(memory_space=pltpu.SMEM),           # big count
            pl.BlockSpec(memory_space=pltpu.SMEM),           # big touch
            pl.BlockSpec(memory_space=pltpu.HBM),            # row stream
            pl.BlockSpec((1, B, big_rows.shape[2]),
                         lambda ty, tx: (0, 0, 0),
                         memory_space=pltpu.VMEM),           # big rows
            tile_spec,                                       # depth in
        ],
        out_specs=[pl.BlockSpec((6, BD * cfg.tile_h, R * cfg.tile_w),
                                lambda ty, tx: (0, ty, tx),
                                memory_space=pltpu.VMEM),
                   tile_spec],
        out_shape=[
            jax.ShapeDtypeStruct((6, ph, pw), jnp.float32),
            jax.ShapeDtypeStruct((ph, pw), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, W, 128), jnp.float32),             # windows
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),                      # resident
        ],
        interpret=cfg.interpret,
    )(y0_arr, starts, counts, big_count, big_touch, stream,
      big_rows, depth_p)
    if cfg.interpret:
        fused, winner = lax.optimization_barrier((fused, winner))

    overflowed = ovf    # [2] = (stream capacity, big list)
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


def shade_from_planes_ranges(winner, num, den, fb, ranges):
    """Dense shading with per-id-range fragment programs: each distinct
    fragment function runs once over the frame and writes the pixels
    whose winning triangle id falls in its [start, end) global range —
    the epilogue that lets ONE merged raster pass mix fragment
    programs the way the reference's render pass mixes pipelines
    (``Draw.zig:23-34``, setPipeline per draw inside one pass).
    Uncovered pixels (winner == -1) match no range.

    Each range is (start, end, fragment_fn, ctx): ``ctx`` (a
    ``vertex_stage.FragmentCtx`` or None) carries the drawn instance's
    fragment-stage bindings for two-parameter fragment programs
    (per-pixel texture sampling etc.)."""
    varp = jnp.moveaxis(num, 0, -1) / den[..., None]
    for start, end, fn, ctx in ranges:
        rgba = fn(varp) if ctx is None else fn(varp, ctx)
        mask = (winner >= start) & (winner < end)
        fb = jnp.where(mask[..., None], rgba, fb)
    return fb
