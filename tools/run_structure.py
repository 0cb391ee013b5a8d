#!/usr/bin/env python
"""Candidate-run structure of the stress workload (BASELINE.md round-4
floor evidence): are a tile's stream candidates contiguous TABLE-ROW
runs (direct-from-table DMA potential), and how dense are aligned
8-row blocks? Consumes tools/dump_stress_tris.py output.

Usage: python tools/dump_stress_tris.py && python tools/run_structure.py
"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"; os.environ["PALLAS_AXON_POOL_IPS"] = ""
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np, jax.numpy as jnp
from myrenderer_tpu.ops import raster_common as rc

d = np.load("/tmp/stress_tris.npz")
clip, vary, valid = d["tri_clip"], d["tri_vary"], d["valid"]
W, H = int(d["width"]), int(d["height"])
tc = rc.triangle_setup(jnp.asarray(clip), jnp.asarray(vary),
                       jnp.asarray(valid), W, H, "back")
val = np.asarray(tc.valid)
T = val.shape[0]
tile_h, tile_w, K = 8, 128, 8
nty, ntx = -(-H // tile_h), -(-W // tile_w)

w = np.maximum(clip[..., 3], 1e-6)
u = (0.5 * clip[..., 0] / w + 0.5) * W
v = (0.5 - 0.5 * clip[..., 1] / w) * H
minx = np.clip(np.floor(u.min(1)), 0, W - 1)
maxx = np.clip(np.ceil(u.max(1)), 0, W - 1)
miny = np.clip(np.floor(v.min(1)), 0, H - 1)
maxy = np.clip(np.ceil(v.max(1)), 0, H - 1)
tx0 = (minx / tile_w).astype(np.int32); tx1 = (maxx / tile_w).astype(np.int32)
ty0 = (miny / tile_h).astype(np.int32); ty1 = (maxy / tile_h).astype(np.int32)
sx = tx1 - tx0 + 1; sy = ty1 - ty0 + 1
span = sx * sy
small = val & (span <= K)
print(f"T={T} valid={val.sum()} small={small.sum()} big={(val & ~small).sum()}")

ids = np.nonzero(small)[0].astype(np.int64)
spn = span[ids]; total = int(spn.sum())
print(f"incidences={total} ({total/val.sum():.3f}/valid tri)")
# expand: rank r in [0, span) -> tile (row-major in the bbox rect)
tri = np.repeat(ids, spn)
r = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(spn) - spn, spn)
rx = r % np.repeat(sx[ids], spn); ry = r // np.repeat(sx[ids], spn)
tile = (np.repeat(ty0[ids], spn) + ry) * ntx + np.repeat(tx0[ids], spn) + rx
o = np.lexsort((tri, tile)); tile, tri = tile[o], tri[o]
newrun = np.ones(total, bool)
newrun[1:] = (np.diff(tile) != 0) | (np.diff(tri) != 1)
runid = np.cumsum(newrun) - 1
rlen = np.bincount(runid)
print(f"runs={len(rlen)} mean={total/len(rlen):.2f} rows/run")
buckets = [1, 2, 4, 8, 16, 32, 64, 10**9]
lo = 1
for hi in buckets[1:]:
    m = (rlen > lo - 1) & (rlen <= hi) if hi != 1 else (rlen == 1)
    mass = int(rlen[m].sum())
    print(f"  run len ({lo:>3}..{hi if hi<10**9 else 'inf':>3}]: "
          f"runs={m.sum():>8} mass={mass:>8} ({mass/total*100:5.1f}%)")
    lo = hi + 0
for t in (8, 16, 32, 64):
    print(f"mass in runs >= {t}: {rlen[rlen>=t].sum()/total*100:.1f}%")
# aligned 8-row blocks: distinct (tile, tri//8)
blk = tri // 8
bkey = tile * (T // 8 + 2) + blk
nblk = len(np.unique(bkey))
print(f"aligned 8-blocks={nblk}  rows-if-block-expanded={8*nblk} "
      f"(x{8*nblk/total:.2f} eval inflation)")
# per-tile runs
tilestart = np.ones(total, bool); tilestart[1:] = np.diff(tile) != 0
ntile = tilestart.sum()
print(f"touched tiles={ntile} runs/tile={len(rlen)/ntile:.2f} "
      f"rows/tile={total/ntile:.1f}")
