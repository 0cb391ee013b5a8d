#!/usr/bin/env python
"""Attribute the demo kernel's sparse-tile tax (round 4 follow-up to
tools/fixedcost_probe.py).

The fixed-cost probe showed EMPTY programs cost 0.18 us, yet the demo
kernel runs ~3 us/program (6.07 ms / 2025) for only ~22 live entries
per touched tile — ~108 ns/entry vs the stress kernel's 18.5. Window
residency (which removes redundant window DMA waits) measured exactly
perf-neutral, so the "DMA-wait tax" story is incomplete. This probe
measures the per-tile cost CURVE directly: synthetic frames with
exactly k one-tile triangles in EVERY (8,128) tile at 1080p, sweeping
k and the eval chunk size.

  kernel_ms(k, chunk) = 2025 * [fixed + ceil-ish(k/chunk) * per_chunk
                                + slots * per_slot]

Sweeping k at fixed chunk gives per-slot + per-chunk mix; sweeping
chunk at fixed k separates them. If per_chunk dominates at demo
occupancy, the fix is a LARGER demo chunk (the demo sweep only ever
went downward: chunk 8 lost, 16 kept — round 1's upward sweep predates
the stream kernel entirely); if per-tile fixed cost dominates, the fix
is elsewhere (carry init / output path), and chunk is a dead lever.

Usage: python tools/occupancy_probe.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
                      "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import shutil  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from myrenderer_tpu.ops import raster_common as rc  # noqa: E402
from myrenderer_tpu.ops import raster_pallas as rp  # noqa: E402
from fixedcost_probe import kernel_ms  # noqa: E402


def make_tris(H, W, tile_h, tile_w, k):
    """k tiny CW triangles per (tile_h, tile_w) tile, each fully inside
    its tile (exactly one bin incidence per triangle)."""
    nty, ntx = H // tile_h, W // tile_w
    ty, tx, i = np.meshgrid(np.arange(nty), np.arange(ntx),
                            np.arange(k), indexing="ij")
    # lane offset spreads the k triangles across the tile's 128 lanes
    px = (tx * tile_w + 2.0 + (i * (tile_w - 8)) / max(k, 1)).ravel()
    py = (ty * tile_h + 2.0).ravel()
    # ~3x3 px CW triangle (y-down screen): right, then down
    corners = np.stack([
        np.stack([px, py], -1),
        np.stack([px + 3.0, py], -1),
        np.stack([px, py + 3.0], -1)], axis=1)  # (T, 3, 2)
    # pixel -> NDC (matches the viewport transform in raster_common)
    ndc = np.empty_like(corners, np.float32)
    ndc[..., 0] = corners[..., 0] * (2.0 / W) - 1.0
    ndc[..., 1] = 1.0 - corners[..., 1] * (2.0 / H)
    T = ndc.shape[0]
    clip = np.concatenate(
        [ndc, np.full((T, 3, 1), 0.5, np.float32),
         np.ones((T, 3, 1), np.float32)], -1)
    return clip


def measure(H, W, cfg, clip, reps=4):
    clip = jnp.asarray(clip)
    T = clip.shape[0]
    vary = jnp.ones((T, 3, 4), jnp.float32)
    tc = rc.triangle_setup(clip, vary, jnp.ones(T, bool), W, H, "back")
    packed = rc.pack_coeffs_full(tc)
    bbox = rp.viewport_bbox(clip, W, H)
    fn = jax.jit(lambda p, v, b, c=cfg: rp.rasterize_packed(
        p, v, b, H, W, cfg=c))
    out = fn(packed, tc.valid, bbox)
    jax.block_until_ready(out)
    # sanity: every triangle must actually rasterize (one winner set
    # per tile minimum) — a probe that binned wrong measures nothing
    logdir = "/tmp/occupancy_prof"
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        for _ in range(reps):
            out = fn(packed, tc.valid, bbox)
        jax.block_until_ready(out)
    return kernel_ms(logdir) / reps


def main():
    H, W = 1080, 1920
    th, tw = 8, 128
    ntiles = (H // th) * (W // tw)

    sweeps = [
        # (label, k per tile, chunk)
        ("k8   c16", 8, 16),
        ("k22  c16", 22, 16),      # ~demo occupancy, demo default cfg
        ("k22  c32", 22, 32),
        ("k22  c64", 22, 64),
        ("k64  c16", 64, 16),
        ("k64  c64", 64, 64),
    ]
    print(f"{ntiles} tiles; all frames 1080p tile8 w128")
    rows = []
    for label, k, chunk in sweeps:
        clip = make_tris(H, W, th, tw, k)
        cfg = rp.RasterConfig(tile_h=th, chunk=chunk, stream_window=128)
        ms = measure(H, W, cfg, clip)
        per_tile = ms * 1e3 / ntiles
        nchunk = -(-k // chunk)  # every segment starts 8-aligned here
        rows.append((label, k, chunk, ms, per_tile))
        print(f"{label:10s} T={k * ntiles:6d}  kernel {ms:7.3f} ms  "
              f"{per_tile:6.2f} us/tile  (~{nchunk} chunks/tile)",
              flush=True)

    # quick attribution: per-chunk cost from the c16 -> c64 delta at
    # fixed k; per-slot cost from the k8 -> k64 delta at fixed chunk
    d = {(k, c): ms for _, k, c, ms, _ in rows}
    if (22, 16) in d and (22, 64) in d:
        dchunks = (-(-22 // 16) - -(-22 // 64)) * ntiles
        print(f"per-chunk cost ~ {(d[(22, 16)] - d[(22, 64)]) * 1e6 / dchunks:.0f} ns "
              f"(from k22 c16 vs c64)")
    if (8, 16) in d and (64, 16) in d:
        dslots = (64 - 8) * ntiles
        dch = (4 - 1) * ntiles
        print(f"(k64-k8)@c16 = {(d[(64, 16)] - d[(8, 16)]) * 1e3:.0f} us over "
              f"{dslots} slots + {dch} chunks")


if __name__ == "__main__":
    main()
