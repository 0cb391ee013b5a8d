#!/usr/bin/env python
"""Kernel-stage benchmark on real hardware: times triangle_setup,
binning, and the full rasterize separately so regressions can be
localized without the full demo.

TIMING METHODOLOGY (important): every timed call gets a DISTINCT input
buffer (the clip array scaled by (1 + i*2^-18) — geometrically the same
triangles, since clip coordinates are homogeneous, but different bits).
Timing repeated calls with IDENTICAL args through the axon relay
produces impossibly fast numbers (identical executions appear to be
deduplicated); distinct inputs force every execution to really run, and
the single device queue serializes them, so wall/n is honest.

Usage:
  python tools/kbench.py [--t 20000] [--h 1080] [--w 1920] [--size 0.05]
  python tools/kbench.py --load /tmp/stress_tris.npz   # real stress batch
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


N_VARIANTS = 10


def make_variants(clip):
    """Distinct-bits copies of the clip array (same geometry: clip
    coords are homogeneous, scaling all 4 components is a no-op)."""
    mk = jax.jit(lambda c, s: c * s)
    return [jax.block_until_ready(mk(clip, jnp.float32(1.0 + i * 2.0**-18)))
            for i in range(N_VARIANTS)]


def _force(out):
    # block_until_ready is NOT reliable through the axon relay: force a
    # tiny host readback of every output to guarantee completion
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf.ravel()[:1])


def timeit(label, fn, variants, fixed, n=N_VARIANTS):
    """Force a readback after EVERY call: holding many in-flight results
    can OOM the device, failed async executions report ready instantly,
    and block_until_ready itself is unreliable through the relay.
    Calibrate per-call overhead with the reported noop time."""
    _force(fn(variants[0], *fixed))   # warm/compile
    t0 = time.perf_counter()
    for i in range(n):
        _force(fn(variants[i % len(variants)], *fixed))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label}: {dt:.3f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=20000)
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--size", type=float, default=0.05)
    ap.add_argument("--load", default=None,
                    help=".npz from tools/dump_stress_tris.py")
    ap.add_argument("--chunk", type=int, default=None)
    ap.add_argument("--window", type=int, default=None)
    ap.add_argument("--k", type=int, default=None, help="max_tiles_per_tri")
    ap.add_argument("--tile", default=None, help="HxW, e.g. 32x128")
    ap.add_argument("--skip-split", action="store_true",
                    help="skip the bin-internals (sort/gather) split")
    args = ap.parse_args()

    cfg = rp.DEFAULT_CONFIG
    import dataclasses
    if args.chunk:
        cfg = dataclasses.replace(cfg, chunk=args.chunk)
    if args.window:
        cfg = dataclasses.replace(cfg, stream_window=args.window)
    if args.k:
        # pin exactly: auto_span would clamp the sweep value back to
        # its own budget
        cfg = dataclasses.replace(cfg, max_tiles_per_tri=args.k,
                                  auto_span=False)
    if args.tile:
        th, tw = (int(v) for v in args.tile.split("x"))
        cfg = dataclasses.replace(cfg, tile_h=th, tile_w=tw)

    if args.load:
        data = np.load(args.load)
        clip = jnp.asarray(data["tri_clip"])
        vary = jnp.asarray(data["tri_vary"])
        valid = jnp.asarray(data["valid"])
        W, H = int(data["width"]), int(data["height"])
        T = clip.shape[0]
    else:
        T, H, W = args.t, args.h, args.w
        clip, vary = random_triangles(T, 0, size=args.size)
        valid = jnp.ones(T, bool)
    print(f"T={T} {W}x{H} cfg={cfg}", flush=True)

    variants = make_variants(clip)

    noop = jax.jit(lambda c, v, vl: c[0, 0, 0])
    timeit("noop (overhead)  ", noop, variants, (vary, valid))

    setup = jax.jit(lambda c, v, vl: rc.triangle_setup(c, v, vl, W, H,
                                                       "back"))

    @jax.jit
    def binned(c, v, vl):
        tc = rc.triangle_setup(c, v, vl, W, H, "back")
        return rp.bin_triangles(tc, c, H, W, cfg)

    @jax.jit
    def full(c, v, vl):
        tc = rc.triangle_setup(c, v, vl, W, H, "back")
        return rp.rasterize(tc, H, W, tri_clip=c, cfg=cfg)

    t_set = timeit("setup            ", setup, variants, (vary, valid))
    t_bin = timeit("setup+bin        ", binned, variants, (vary, valid))
    t_full = timeit("setup+bin+kernel ", full, variants, (vary, valid))
    print(f"  => bin ~{t_bin - t_set:.3f} ms, kernel ~{t_full - t_bin:.3f}"
          " ms", flush=True)

    if not args.skip_split:
        # binning internals: the per-row-group (tile,tri)-key sorts and
        # the stream gather, on the REAL key distribution. Mirrors
        # bin_packed's geometry exactly — span budget, row-group split
        # and the i32/u32 dtype ladder — so the timed sort runs on the
        # same dtype/key space as the real frame (an earlier version
        # re-derived keys as plain i32 and silently wrapped at
        # megatriangle scale; ADVICE r2).
        nty, ntx = -(-H // cfg.tile_h), -(-W // cfg.tile_w)
        NT = nty * ntx
        K = rp._span_budget(T, NT, cfg)

        def group_space(rows):
            return (rows * ntx + 1) * (T + 1)

        F = 1
        while F < min(nty, 8) and group_space(-(-nty // F)) >= 2**32:
            F += 1
        rpg = -(-nty // F)
        dt = jnp.int32 if group_space(rpg) < 2**31 else jnp.uint32
        print(f"bin internals: K={K} groups={F} dtype={dt.__name__}",
              flush=True)

        def real_keys(c, tc):
            wv = jnp.maximum(c[..., 3], rc.W_EPS)
            u = (0.5 * c[..., 0] / wv + 0.5) * W
            v = (0.5 - 0.5 * c[..., 1] / wv) * H
            minx = jnp.clip(jnp.floor(u.min(1)), 0, W - 1)
            maxx = jnp.clip(jnp.ceil(u.max(1)), 0, W - 1)
            miny = jnp.clip(jnp.floor(v.min(1)), 0, H - 1)
            maxy = jnp.clip(jnp.ceil(v.max(1)), 0, H - 1)
            tx0 = (minx / cfg.tile_w).astype(jnp.int32)
            tx1 = (maxx / cfg.tile_w).astype(jnp.int32)
            ty0 = (miny / cfg.tile_h).astype(jnp.int32)
            ty1 = (maxy / cfg.tile_h).astype(jnp.int32)
            sx = tx1 - tx0 + 1
            span = sx * (ty1 - ty0 + 1)
            small = tc.valid & (span <= K)
            eK = jnp.arange(K, dtype=jnp.int32)[:, None]
            sxr = jnp.maximum(sx, 1)[None, :]
            ey = eK // sxr
            ex = eK - ey * sxr
            tile = (ty0[None, :] + ey) * ntx + (tx0[None, :] + ex)
            live = small[None, :] & (eK < span[None, :])
            tile = jnp.where(live, tile, NT).reshape(-1)
            tri = jnp.broadcast_to(
                jnp.arange(T, dtype=jnp.int32)[None, :],
                (K, T)).reshape(-1)
            keys = []
            for g in range(F):
                base = g * rpg * ntx
                ntg = min(rpg, nty - g * rpg) * ntx
                if ntg <= 0:
                    break
                in_g = (tile >= base) & (tile < base + ntg)
                ltile = jnp.where(in_g, tile - base, ntg)
                keys.append(jnp.sort(ltile.astype(dt) * dt(T + 1)
                                     + tri.astype(dt), stable=False))
            return keys

        @jax.jit
        def sort_only(c, v, vl):
            tc = rc.triangle_setup(c, v, vl, W, H, "back")
            return real_keys(c, tc)

        @jax.jit
        def gather_only(c, v, vl):
            tc = rc.triangle_setup(c, v, vl, W, H, "back")
            packed = rc.pack_coeffs_full(tc)
            outs = []
            for keys in real_keys(c, tc):
                idx = jnp.clip((keys % dt(T + 1)).astype(jnp.int32),
                               0, T - 1)
                outs.append(packed[idx])
            return outs

        t_sort = timeit("setup+sort       ", sort_only, variants,
                        (vary, valid))
        t_gath = timeit("setup+sort+gather", gather_only, variants,
                        (vary, valid))
        print(f"  => sort ~{t_sort - t_set:.3f} ms, "
              f"gather(full K*T) ~{t_gath - t_sort:.3f} ms", flush=True)

    d, w, _n, _dn, ovf = jax.block_until_ready(full(variants[0], vary,
                                                    valid))
    cov = (np.asarray(w) >= 0).mean()
    print(f"coverage={cov:.3f} overflow={np.asarray(ovf).tolist()} "
          f"-> {T / t_full / 1e3:.2f} Mtri/s", flush=True)


if __name__ == "__main__":
    main()
