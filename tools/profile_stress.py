#!/usr/bin/env python
"""Profile one stress frame with jax.profiler; parse the resulting
xplane with tools/xplane_ledger.py (the tensorboard converter crashes
on this container's protobuf version)."""
import glob
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from myrenderer_tpu.app.stress import StressApp  # noqa: E402

logdir = "/tmp/stressprof"
os.system(f"rm -rf {logdir}")

raster = None
if len(sys.argv) > 1:   # optional RasterConfig sweep spec (--raster arg)
    from myrenderer_tpu.ops.raster_pallas import config_from_flag
    raster = config_from_flag(sys.argv[1])

app = StressApp(raster=raster)
app.tick()
jax.block_until_ready(app.window.framebuffer)
print("warm; tracing one frame", flush=True)

with jax.profiler.trace(logdir):
    app.tick()
    jax.block_until_ready(app.window.framebuffer)
print("traced", flush=True)

# print the device op ledger straight away (the tensorboard converter
# crashes on this container's protobuf version; tools/xplane_ledger.py
# parses the raw xplane with the pure-Python protobuf implementation)
paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplanes:", paths, flush=True)
print("parse with: python tools/xplane_ledger.py", logdir, flush=True)
