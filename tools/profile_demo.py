#!/usr/bin/env python
"""Profile one demo frame (jax.profiler xplane) and print the device
op ledger via tools/xplane_ledger.py. Usage:
  python tools/profile_demo.py [--size 1920x1080] [--raster th,tw,c,w]
"""
import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from myrenderer_tpu.app.demo import DemoApp  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("--size", default="1920x1080")
ap.add_argument("--raster", default=None)
ap.add_argument("--logdir", default="/tmp/demoprof")
args = ap.parse_args()

raster = None
if args.raster:
    from myrenderer_tpu.ops.raster_pallas import RasterConfig
    vals = [int(v) for v in args.raster.split(",")]
    raster = RasterConfig(tile_h=vals[0], tile_w=vals[1], chunk=vals[2],
                          stream_window=vals[3])
w, h = (int(v) for v in args.size.split("x"))
os.system(f"rm -rf {args.logdir}")
app = DemoApp(width=w, height=h, backend="pallas", raster=raster)
for _ in range(3):
    app.tick()
jax.block_until_ready(app.window.framebuffer)
print("warm; tracing 4 frames", flush=True)
with jax.profiler.trace(args.logdir):
    for _ in range(4):
        app.tick()
    jax.block_until_ready(app.window.framebuffer)
print("traced; parse with tools/xplane_ledger.py", args.logdir, flush=True)
