#!/usr/bin/env python
"""Profile one stress frame with jax.profiler and print the device
op-time breakdown (top HLO ops by self time), using
tensorboard_plugin_profile's xplane converter."""
import glob
import gzip
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

# find the xplane file and convert to op stats
paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplanes:", paths, flush=True)
if paths:
    from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t
    for tool in ("op_profile", "overview_page^"):
        try:
            data, _ = r2t.xspace_to_tool_data([paths[0]], tool, {})
            out = f"/tmp/stressprof_{tool.strip('^')}.json"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out, mode) as f:
                f.write(data)
            print("wrote", out, flush=True)
        except Exception as e:
            print(f"{tool}: FAILED {e}", flush=True)
