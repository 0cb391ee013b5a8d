#!/usr/bin/env python
"""Host-side per-frame cost of the demo tick loop.

The demo's wall-clock floor is max(host dispatch, device time): the
xplane ledger gives device time (~5.8 ms at 1080p), and THIS tool gives
the host side — cProfile over N ticks with NO device fence inside the
loop, so the measured time is what the host needs to issue frames
while the device runs ahead asynchronously. If host-per-frame ~ wall
ms/frame, the loop is host/dispatch-bound and Python-side work is the
lever; if it is much smaller, the gap is relay/device time.

Usage:  python tools/host_profile.py [--frames 200] [--size 1920x1080]
        (add JAX_COMPILATION_CACHE_DIR=/root/jax_cache on TPU)
"""

import argparse
import cProfile
import io
import os
import pstats
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

from myrenderer_tpu.app.demo import DemoApp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    app = DemoApp(width=w, height=h, backend="auto")
    app.tick()  # compile
    jax.block_until_ready(app.window.framebuffer)

    # un-profiled wall reference (same loop shape as demo --time)
    t0 = time.perf_counter()
    for _ in range(args.frames):
        app.tick()
    jax.block_until_ready(app.window.framebuffer)
    wall = (time.perf_counter() - t0) / args.frames

    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    for _ in range(args.frames):
        app.tick()
    prof.disable()
    host = (time.perf_counter() - t0) / args.frames  # NO fence: host cost
    jax.block_until_ready(app.window.framebuffer)

    print(f"wall (fenced): {wall * 1e3:.3f} ms/frame; host issue rate "
          f"(unfenced, profiled): {host * 1e3:.3f} ms/frame")
    s = io.StringIO()
    st = pstats.Stats(prof, stream=s).sort_stats("cumulative")
    st.print_stats(args.top)
    print(s.getvalue())


if __name__ == "__main__":
    main()
