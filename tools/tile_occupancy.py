#!/usr/bin/env python
"""Per-tile live-entry distribution of the REAL demo scene + chunk
cost model (round-5 follow-up to tools/occupancy_probe.py).

The occupancy probe measures the kernel's per-tile cost curve on
SYNTHETIC frames with a uniform k triangles in every tile. The real
demo scene is nothing like uniform: the perspective terrain horizon
piles hundreds of triangles into a few tiles while most touched tiles
hold <= a dozen (frame-0 medians: 15 entries/tile at 1080p t16, 10 at
4K t32, 8 at 8K t64 — mean 45/26/16, max 619/336/239). This script
reconstructs the frame-0 terrain triangles on CPU (clip coords are
resolution-independent; the 19 polygon tris are ignored), bins their
viewport bboxes at each resolution's auto_config tile size, and prints

  eval slots(chunk) = sum over touched tiles of ceil(k_tile/chunk)*chunk

— the kernel's (G, THW) eval work including boundary-chunk slack
(dead rows masked by `live`, raster_pallas.py eval_block). Frame-0
model output (2026-08-20):

  1080p t16: c32 slack 29.7% (c16 1.23x fewer slots, c8 1.34x)
  4K   t32: c32 slack 45.0% (c16 1.38x, c8 1.62x)
  8K   t64: c32 slack 57.6% (c16 1.52x, c8 1.95x)

i.e. the boundary-chunk slack fraction GROWS with the auto ladder:
tile area scales ~ px/tri so the median entries/tile stays ~8-15 while
the chunk stays 32. This motivated the round-5 batch-19 downward chunk
sweep (chunks < 32 had only ever been swept at 1080p, where the
synthetic U-curve said c32). RESULT (BASELINE.md batch 19): 8K t64c16
measured a wash-to-slight-loss vs the c32 anchors (41.39 vs
40.71/41.21 ms same-batch) — the model counts eval SLOTS only, and the
~110-220 ns per-chunk fixed cost (loop step + plane-recovery matmul
issue) on 2x the chunks cancels the 1.52x slot saving: slack rows are
masked-dead VPU lanes inside an already-issued block; the 4K leg read
the same wash (t32c16 11.49 vs c32 11.39 ms back-to-back). chunk 32
stays; keep this model as a screening tool, the hardware A/B decides.

Usage (CPU, no TPU needed):
  python tools/tile_occupancy.py
"""
import os
import sys

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

# sitecustomize pre-registers the axon TPU plugin before this script
# runs; env vars are too late (tests/conftest.py has the same note)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402,F401

from myrenderer_tpu import math3d  # noqa: E402
from myrenderer_tpu.app.assets import default_heightmap  # noqa: E402
from myrenderer_tpu.content.terrain import _QUAD_VALS  # noqa: E402
from myrenderer_tpu.ops import raster_common as rc  # noqa: E402
from myrenderer_tpu.ops import raster_pallas as rp  # noqa: E402


def demo_terrain_clip(t: float = 0.0) -> np.ndarray:
    """Frame-``t`` terrain triangles in clip space, [T, 3, 4] f32 —
    the demo's vertex stage replayed with numpy (content/terrain.py
    ``_make_vertex_batch_fn`` math, data_xform = identity, camera =
    app/demo.py tick())."""
    size = 100
    heights = (1.0 - default_heightmap().astype(np.float32)
               / 65535.0).reshape(-1)
    s2 = size * size
    proj = np.asarray(math3d.perspective(90, 1.0, 0.1, 200))
    cam = (10.0 * np.cos(t), 6.0, 10.0 * np.sin(t))
    view = np.asarray(math3d.look_at(cam, (0.0, 0.0, 0.0),
                                     (0.0, 1.0, 0.0)))
    m = proj @ view

    quad = np.arange(s2)
    qx = (quad // size).astype(np.float32)
    qz = (quad % size).astype(np.float32)
    hm_ext = np.concatenate([heights, np.repeat(heights[-1:], size + 1)])
    c_q, c_qs = hm_ext[0:s2], hm_ext[size:s2 + size]
    c_qs1, c_q1 = hm_ext[size + 1:s2 + size + 1], hm_ext[1:s2 + 1]
    hs = [c_qs, c_q, c_qs1, c_qs1, c_q, c_q1]

    slots = []
    for s in range(6):
        x = 0.2 * (_QUAD_VALS[s, 0] + qx) - 0.1 * size
        z = 0.2 * (_QUAD_VALS[s, 1] + qz) - 0.1 * size
        y = 5.0 * hs[s]
        p = np.stack([x, y, z, np.ones_like(x)], -1)
        slots.append(p @ m.T)
    return np.concatenate([np.stack(slots[0:3], 1),
                           np.stack(slots[3:6], 1)]).astype(np.float32)


def tile_counts(tri_clip: np.ndarray, W: int, H: int,
                cfg: rp.RasterConfig) -> np.ndarray:
    """Live entries per TOUCHED tile (bbox-incidence counts, the
    bin_packed clamp math over post-setup-valid triangles)."""
    T = tri_clip.shape[0]
    tc = rc.triangle_setup(jnp.asarray(tri_clip),
                           jnp.zeros_like(jnp.asarray(tri_clip)),
                           jnp.ones(T, bool), W, H, "back")
    bbox = rp.viewport_bbox(jnp.asarray(tri_clip), W, H)
    v = np.array(tc.valid)
    minx, maxx, miny, maxy = (np.asarray(b) for b in bbox)
    v &= (maxy >= 0) & (miny < H) & (maxx >= 0) & (minx < W)
    minx = np.clip(np.floor(minx), 0, W - 1)[v]
    maxx = np.clip(np.ceil(maxx), 0, W - 1)[v]
    miny = np.clip(np.floor(miny), 0, H - 1)[v]
    maxy = np.clip(np.ceil(maxy), 0, H - 1)[v]
    ntx = -(-W // cfg.tile_w)
    tx0, tx1 = (minx // cfg.tile_w).astype(int), \
        (maxx // cfg.tile_w).astype(int)
    ty0, ty1 = (miny // cfg.tile_h).astype(int), \
        (maxy // cfg.tile_h).astype(int)
    counts: dict[int, int] = {}
    for a0, a1, b0, b1 in zip(ty0, ty1, tx0, tx1):
        for ty in range(a0, a1 + 1):
            for tx in range(b0, b1 + 1):
                k = ty * ntx + tx
                counts[k] = counts.get(k, 0) + 1
    return np.array(sorted(counts.values()))


def main():
    tri_clip = demo_terrain_clip()
    T = tri_clip.shape[0]
    for (W, H) in [(1920, 1080), (3840, 2160), (7680, 4320)]:
        cfg = rp.auto_config(W, H, T)
        ks = tile_counts(tri_clip, W, H, cfg)
        tot = int(ks.sum())
        print(f"\n{W}x{H} auto t{cfg.tile_h}c{cfg.chunk}: "
              f"entries={tot} touched_tiles={len(ks)} "
              f"mean={tot / len(ks):.1f} median={np.median(ks):.0f} "
              f"p90={np.percentile(ks, 90):.0f} max={ks.max()}")
        base = None
        for c in (8, 16, 32, 64):
            cost = int((np.ceil(ks / c) * c).sum())
            base = base or cost
            print(f"  chunk {c:2d}: eval slots {cost:9d} "
                  f"(slack {(cost - tot) / cost:5.1%}, "
                  f"vs c8 {cost / base:.2f}x)")
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
