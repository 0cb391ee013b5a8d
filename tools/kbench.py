#!/usr/bin/env python
"""Kernel-stage microbenchmark on real hardware: times triangle_setup,
binning, and the full rasterize separately for a synthetic batch, so
kernel regressions can be localized without the full demo.

Usage: python tools/kbench.py [--t 20000] [--h 1080] [--w 1920]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from myrenderer_tpu.ops import raster_common as rc  # noqa: E402
from myrenderer_tpu.ops import raster_pallas as rp  # noqa: E402


def random_triangles(n, seed, size=0.05):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-1.1, 1.1, (n, 1, 2)).astype(np.float32)
    d = rng.uniform(-size, size, (n, 3, 2)).astype(np.float32)
    ndc = c + d
    z = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    w = rng.uniform(0.8, 5.0, (n, 3)).astype(np.float32)
    d1 = ndc[:, 1] - ndc[:, 0]
    d2 = ndc[:, 2] - ndc[:, 0]
    cross = d1[:, 0] * (-d2[:, 1]) - (-d1[:, 1]) * d2[:, 0]
    ndc[cross < 0] = ndc[cross < 0][:, ::-1]
    clip = np.concatenate(
        [ndc * w[..., None], (z * w)[..., None], w[..., None]], -1)
    vary = rng.uniform(0, 1, (n, 3, 4)).astype(np.float32)
    return jnp.asarray(clip), jnp.asarray(vary)


def timeit(label, fn, *args, n=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label}: {dt:.3f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=20000)
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--size", type=float, default=0.05)
    ap.add_argument("--chunk", type=int, default=None)
    ap.add_argument("--window", type=int, default=None)
    ap.add_argument("--tile", default=None, help="HxW, e.g. 32x128")
    args = ap.parse_args()
    T, H, W = args.t, args.h, args.w

    cfg = rp.DEFAULT_CONFIG
    import dataclasses
    if args.chunk:
        cfg = dataclasses.replace(cfg, chunk=args.chunk)
    if args.window:
        cfg = dataclasses.replace(cfg, stream_window=args.window)
    if args.tile:
        th, tw = (int(v) for v in args.tile.split("x"))
        cfg = dataclasses.replace(cfg, tile_h=th, tile_w=tw)
    print(f"T={T} {W}x{H} tri_size={args.size} cfg={cfg}")

    clip, vary = random_triangles(T, 0, size=args.size)
    valid = jnp.ones(T, bool)

    setup = jax.jit(lambda c, v, vl: rc.triangle_setup(c, v, vl, W, H,
                                                       "back"))
    tc = jax.block_until_ready(setup(clip, vary, valid))

    @jax.jit
    def binned(c, v, vl):
        tc = rc.triangle_setup(c, v, vl, W, H, "back")
        return rp.bin_triangles(tc, c, H, W, cfg)

    @jax.jit
    def full(c, v, vl):
        tc = rc.triangle_setup(c, v, vl, W, H, "back")
        return rp.rasterize(tc, H, W, tri_clip=c, cfg=cfg)

    timeit("setup            ", setup, clip, vary, valid)
    timeit("setup+bin        ", binned, clip, vary, valid)
    t_full = timeit("setup+bin+kernel ", full, clip, vary, valid)

    d, w, _n, _dn, ovf = jax.block_until_ready(full(clip, vary, valid))
    cov = (np.asarray(w) >= 0).mean()
    print(f"coverage={cov:.3f} overflow={np.asarray(ovf).tolist()} "
          f"-> {T / t_full / 1e3:.2f} Mtri/s")


if __name__ == "__main__":
    main()
