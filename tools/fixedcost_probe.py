#!/usr/bin/env python
"""Attribute the raster kernel's per-program fixed cost (VERDICT r3
lever 8: the demo floor is ~2.4 us x 2025 tile programs and three
amortization knobs failed on guesses — identify the composition before
touching anything else).

Method: rasterize a NEAR-EMPTY frame (T=4 tiny triangles at 1080p) so
per-entry eval work is ~zero and the kernel time is almost pure
per-program overhead (grid sequencing + in/out block DMA + CSR SMEM
reads + output writes + epilogue prefetch logic). Sweep the program
count (tile_h) and the structural knobs that change WHICH overhead
dominates:

  - tile_h 8/16/32       -> 2025/1020/510 programs: the slope is the
                            per-program cost, the intercept the
                            per-frame cost
  - stream_window 64/256 -> scratch VMEM footprint + window DMA size:
                            if cost tracks window size, it's the
                            (always-started) first-window DMA wait
  - bands 2              -> halves program count without changing
                            per-tile work: if cost tracks PROGRAMS,
                            dispatch dominates; if it tracks TILES,
                            the per-tile body (CSR reads + output
                            writes + prefetch) dominates

Each config is traced with jax.profiler and the kernel custom-call's
self time extracted from the xplane (the only trustworthy per-op
signal through the relay — CLAUDE.md).

Usage: python tools/fixedcost_probe.py
"""

import collections
import glob
import os
import shutil
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
                      "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from myrenderer_tpu.ops import raster_common as rc  # noqa: E402
from myrenderer_tpu.ops import raster_pallas as rp  # noqa: E402


def kernel_ms(logdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    path = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                            recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        tot = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                tot[name] += ev.duration_ps / 1e9
        kern = sum(ms for name, ms in tot.items()
                   if "custom-call" in name)
        return kern
    return float("nan")


def main():
    H, W = 1080, 1920
    T = 4
    # 4 tiny CW triangles near the frame center
    base = np.array([[0.0, 0.0], [0.02, 0.0], [0.0, -0.02]], np.float32)
    ndc = np.stack([base + 0.05 * i for i in range(T)])
    clip = np.concatenate(
        [ndc, np.full((T, 3, 1), 0.5, np.float32),
         np.ones((T, 3, 1), np.float32)], -1)
    vary = np.ones((T, 3, 4), np.float32)
    tc = rc.triangle_setup(jnp.asarray(clip), jnp.asarray(vary),
                           jnp.ones(T, bool), W, H, "back")
    packed = rc.pack_coeffs_full(tc)
    bbox = rp.viewport_bbox(jnp.asarray(clip), W, H)

    configs = [
        ("tile8  w256", rp.RasterConfig(tile_h=8, chunk=16)),
        ("tile16 w256", rp.RasterConfig(tile_h=16, chunk=16)),
        ("tile32 w256", rp.RasterConfig(tile_h=32, chunk=16)),
        ("tile8  w64", rp.RasterConfig(tile_h=8, chunk=16,
                                       stream_window=64)),
        ("tile8  w256 bands2", rp.RasterConfig(tile_h=8, chunk=16,
                                               bands=2)),
        ("tile8  w256 tiles_x3", rp.RasterConfig(tile_h=8, chunk=16,
                                                 tiles_x=3)),
    ]
    results = []
    for name, cfg in configs:
        fn = jax.jit(lambda p, v, b, c=cfg: rp.rasterize_packed(
            p, v, b, H, W, cfg=c))
        out = fn(packed, tc.valid, bbox)
        jax.block_until_ready(out)
        logdir = "/tmp/fixedcost_prof"
        shutil.rmtree(logdir, ignore_errors=True)
        with jax.profiler.trace(logdir):
            for _ in range(4):
                out = fn(packed, tc.valid, bbox)
            jax.block_until_ready(out)
        ms = kernel_ms(logdir) / 4.0
        ntiles = ((H + cfg.tile_h - 1) // cfg.tile_h) * (W // 128)
        nprog = ntiles // (cfg.bands * cfg.tiles_x)
        results.append((name, ms, nprog, ntiles))
        print(f"{name:22s} kernel {ms:7.3f} ms  programs {nprog:5d} "
              f"tiles {ntiles:5d}  -> {ms * 1e3 / nprog:.2f} us/program"
              f"  {ms * 1e3 / ntiles:.2f} us/tile", flush=True)


if __name__ == "__main__":
    main()
