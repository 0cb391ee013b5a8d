#!/usr/bin/env python
"""Locate where the stress config's frame time goes: host dispatch vs
device execution vs per-frame transfers/syncs.

Reuses the compiled stress frame program (cache hit if stress ran
before). Prints per-frame times for a pipelined loop (block only at the
end) and a blocked loop (block every frame), plus a host-side split of
tick() (_gather_args vs plan.fn dispatch).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from myrenderer_tpu.app.stress import StressApp  # noqa: E402
from myrenderer_tpu import math3d  # noqa: E402
import math  # noqa: E402


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    app = StressApp()
    print(f"triangles/frame: {app.triangles}", flush=True)
    t0 = time.perf_counter()
    app.tick()
    jax.block_until_ready(app.window.framebuffer)
    print(f"first frame (compile): {time.perf_counter() - t0:.1f}s",
          flush=True)

    # pipelined loop
    t0 = time.perf_counter()
    for _ in range(frames):
        app.tick()
    jax.block_until_ready(app.window.framebuffer)
    dt = (time.perf_counter() - t0) / frames
    print(f"pipelined : {dt * 1000:8.1f} ms/frame", flush=True)

    # blocked loop
    t0 = time.perf_counter()
    for _ in range(frames):
        app.tick()
        jax.block_until_ready(app.window.framebuffer)
    dt = (time.perf_counter() - t0) / frames
    print(f"blocked   : {dt * 1000:8.1f} ms/frame", flush=True)

    # host-side split of one tick (camera update + begin/clear/draw)
    rend, draw, window = app.renderer, app.draw, app.window
    for rep in range(3):
        t = rend.elapsed_time
        r = 1.1 * app._bound
        cam = (r * math.cos(t), 0.9 * app._bound + 6.0, r * math.sin(t))
        app.terrain.set_xform(
            math3d.look_at(cam, (0.0, 0.0, 0.0), (0.0, 1.0, 0.0)))
        draw.begin()
        draw.clear((0.259, 0.141, 0.271, 1.0))
        draw.draw_surface(app.surface)
        t0 = time.perf_counter()
        plan = draw._get_plan(window)
        t1 = time.perf_counter()
        args = draw._gather_args(plan, window)
        t2 = time.perf_counter()
        fb, overflow = plan.fn(args)
        t3 = time.perf_counter()
        jax.block_until_ready(fb)
        t4 = time.perf_counter()
        ovf = np.asarray(overflow)
        t5 = time.perf_counter()
        window.framebuffer = fb
        rend.update()
        print(f"split rep{rep}: plan {1e3*(t1-t0):7.2f}  gather "
              f"{1e3*(t2-t1):7.2f}  dispatch {1e3*(t3-t2):7.2f}  "
              f"block {1e3*(t4-t3):7.2f}  ovf-read {1e3*(t5-t4):7.2f} ms"
              f"  ovf={ovf.tolist()}", flush=True)


if __name__ == "__main__":
    main()
