#!/usr/bin/env python
"""On-hardware verification suite (run on a real TPU; the pytest suite
runs on CPU by design).

Checks:
  1. Pallas-vs-oracle parity on random triangle batches (winners AND
     depth must be bit-identical on hardware — same rulebook, same chip).
  2. Full demo frame: finite pixels, no bin/big overflow.
  3. Steady-state timing report.

Usage: python tools/tpu_checks.py
"""

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
from myrenderer_tpu.ops import raster_ref as rr  # noqa: E402


def random_triangles(n, seed):
    rng = np.random.default_rng(seed)
    ndc = rng.uniform(-1.2, 1.2, (n, 3, 2)).astype(np.float32)
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


def oracle_planes(tc, winner, H, W):
    """Oracle nums/den: the winning triangle's varying numerator /
    denominator PLANES evaluated at pixel centers — the same
    ``a*px + b*py + c`` expression on the same coefficient bits as the
    kernel's MXU-recovered planes (``rc.resolve_varyings`` pre-divide),
    with uncovered pixels at the kernel's (0s, 1) convention. The
    hardware assertion this feeds is exactly what ADVICE r3 flagged as
    uncovered: the varying planes are the output the MXU recovery dot
    reroutes, and winner/depth parity alone cannot see a bf16-truncated
    contraction."""
    covered = winner >= 0
    t = jnp.maximum(winner, 0)
    px, py = rc.pixel_grids(H, W)
    col_abc = tc.col_abc[t]                      # [H, W, 3, C]
    en_abc = tc.en_abc[t]                        # [H, W, 3]
    den = (en_abc[..., 0] * px + en_abc[..., 1] * py + en_abc[..., 2])
    num = (col_abc[..., 0, :] * px[..., None]
           + col_abc[..., 1, :] * py[..., None]
           + col_abc[..., 2, :])                 # [H, W, C]
    num = jnp.where(covered[..., None], num, 0.0)
    den = jnp.where(covered, den, 1.0)
    return jnp.moveaxis(num, -1, 0), den         # [C, H, W], [H, W]


def _ulps(a, b):
    return int(np.abs(np.asarray(a).view(np.int32)
                      - np.asarray(b).view(np.int32)).max())


def check_parity():
    H, W = 96, 256
    ok = True
    # surviving sweep knobs (subtiles/packed_stream pruned round 4):
    # banded programs and multi-tile programs must stay bit-exact.
    # big_scale=4 on the tile8 config: at T=512 random tris over a
    # 96x256 viewport hundreds exceed the 8-tile span budget and route
    # big — the default 256 slots overflow (dropping triangles, by
    # design), which is a capacity artifact, not a kernel deviation
    band_cfg = rp.RasterConfig(tile_h=8, tile_w=128, bands=2,
                               big_scale=4)
    tx_cfg = rp.RasterConfig(tile_h=16, tile_w=128, tiles_x=2,
                             big_scale=2)
    for n, seed in [(16, 0), (128, 1), (512, 2)]:
        clip, vary = random_triangles(n, seed)
        valid = jnp.ones(n, bool)
        tc = rc.triangle_setup(clip, vary, valid, W, H, "back")
        d_r, w_r = jax.jit(
            lambda tc: rr.rasterize_visibility(tc, H, W))(tc)
        d_p, w_p, n_p, den_p, ovf = jax.jit(
            lambda tc, c: rp.rasterize(tc, H, W, tri_clip=c))(tc, clip)
        n_r, den_r = jax.jit(
            lambda tc, w: oracle_planes(tc, w, H, W))(tc, w_r)
        wd = int((np.asarray(w_r) != np.asarray(w_p)).sum())
        ulps = _ulps(d_r, d_p)
        vulps = max(_ulps(n_r, n_p), _ulps(den_r, den_p))
        print(f"parity T={n}: winner diffs={wd} depth ulps={ulps} "
              f"vary-plane ulps={vulps} "
              f"overflow={np.asarray(ovf).tolist()}")
        ok &= wd == 0 and vulps == 0 and not np.asarray(ovf).any()
        for name, kcfg in (("bands=2", band_cfg),
                           ("tiles_x=2", tx_cfg)):
            d_s, w_s, n_s, den_s, ovf_s = jax.jit(
                lambda tc, c, k=kcfg: rp.rasterize(
                    tc, H, W, tri_clip=c, cfg=k))(tc, clip)
            wds = int((np.asarray(w_p) != np.asarray(w_s)).sum())
            ulps_s = _ulps(d_p, d_s)
            vulps_s = max(_ulps(n_p, n_s), _ulps(den_p, den_s))
            print(f"  {name} vs default: winner diffs={wds} "
                  f"depth ulps={ulps_s} vary-plane ulps={vulps_s} "
                  f"overflow={np.asarray(ovf_s).tolist()}")
            ok &= (wds == 0 and ulps_s == 0 and vulps_s == 0
                   and not np.asarray(ovf_s).any())
    return ok


def check_demo():
    from myrenderer_tpu.app.demo import DemoApp

    app = DemoApp(width=1920, height=1080, backend="pallas")
    app.tick()
    jax.block_until_ready(app.window.framebuffer)
    t0 = time.perf_counter()
    N = 60
    for _ in range(N):
        app.tick()
    jax.block_until_ready(app.window.framebuffer)
    dt = (time.perf_counter() - t0) / N * 1000
    fb = np.asarray(app.window.framebuffer)
    finite = bool(np.isfinite(fb).all())
    ovf = np.asarray(app.draw.last_overflow)
    print(f"demo 1080p: {dt:.2f} ms/frame ({1000 / dt:.1f} fps) "
          f"finite={finite} overflow={ovf.tolist()}")
    return finite and not ovf.any()


if __name__ == "__main__":
    ok = check_parity()
    ok &= check_demo()
    print("TPU CHECKS", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)
