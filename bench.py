#!/usr/bin/env python
"""Benchmark: the full App demo scene at 1080p, plus the other two
headline configs (4K/1M-triangle stress, 8K demo) as extra rows.

Prints ONE JSON line:
  {"metric": "demo_1080p_fps", "value": N, "unit": "frames/sec",
   "vs_baseline": M, "extra_metrics": [stress-4K/1M row, 8K-demo row]}

The extra rows regression-track what BASELINE.md claims (VERDICT r4
weak #5: the stress and 8K headlines previously lived only in prose).
Each carries min/median/max over its runs and an overflow guard — a
frame that dropped triangles must not masquerade as a perf win
(``app/stress.py`` posture).

The reference publishes no numbers (BASELINE.md), so vs_baseline is
measured against this repo's own CPU oracle rasterizer on the same
scene/resolution — the denominator BASELINE.md's measurement plan
defines. The oracle baseline is measured once and cached in
.bench_baseline.json (delete to re-measure).

Usage:
  python bench.py            # full: pallas on the available accelerator
  python bench.py --smoke    # quick correctness-and-timing smoke (256px)
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")

import jax  # noqa: E402

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from myrenderer_tpu.app.demo import DemoApp  # noqa: E402

BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")

# Demo workload at any resolution (BASELINE.md): terrain 100x100 quads
# x 2 tris + heptagon (5) + square (2)
DEMO_TRIANGLES = 100 * 100 * 2 + 5 + 2


def measure(app: DemoApp, frames: int, runs: int = 5) -> list:
    """Steady-state seconds/frame: SORTED ``runs`` timed runs of
    ``frames`` frames each (jit warm, block-fenced). The headline is
    the min; callers also record the median/max (ADVICE r3 — min alone
    hides a bimodal device-side regression such as occasional slow
    frames from a capacity edge).

    Min as headline, not median: the shared axon relay pool adds
    strictly one-sided contention noise that drifts by 1.3-2.7x over
    hours with the code held constant (BASELINE.md "Relay drift" — the
    identical round-2 commit measured 7.82 ms at midday and 21.0 ms
    that evening; BENCH_r02 captured 112.7 fps where repeated local
    measurement said ~127). Each sample is already a ``frames``-frame
    average, so the min of five is the least-contaminated estimate of
    renderer cost, not a lucky single frame."""
    app.tick()
    jax.block_until_ready(app.window.framebuffer)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        for _ in range(frames):
            app.tick()
        jax.block_until_ready(app.window.framebuffer)
        times.append((time.perf_counter() - t0) / frames)
    return sorted(times)


def cpu_oracle_baseline(width: int, height: int) -> float:
    """Frames/sec of the slow CPU oracle on the same scene (cached)."""
    key = f"oracle_cpu_{width}x{height}_fps"
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
    if key in cache:
        return cache[key]
    # Run the oracle on CPU in a subprocess (this process owns the TPU).
    import subprocess
    code = f"""
import sys, time, json, os
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
from myrenderer_tpu.app.demo import DemoApp
app = DemoApp(width={width}, height={height}, backend="oracle")
app.tick()
jax.block_until_ready(app.window.framebuffer)
t0 = time.perf_counter()
N = 3
for _ in range(N):
    app.tick()
jax.block_until_ready(app.window.framebuffer)
print(json.dumps(N / (time.perf_counter() - t0)))
"""
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=3600)
    fps = float(out.stdout.strip().splitlines()[-1])
    cache[key] = fps
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cache, f)
    return fps


def probe_backend(timeout_s: int = 900) -> bool:
    """True when the accelerator backend initializes. The axon TPU
    relay can go UNAVAILABLE for hours (pool maintenance) and
    jax.devices() then blocks forever in C++ — probe in a subprocess
    with a hard timeout so the bench emits an honest failure line
    instead of hanging the driver."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _timed_rows(app, frames: int, runs: int, triangles: int) -> dict:
    """min/median/max row over ``runs`` timed runs + overflow guard."""
    import numpy as np
    times = measure(app, frames, runs=runs)
    ovf = np.asarray(app.draw.last_overflow)
    fps = 1.0 / times[0]
    return {
        "value": round(fps, 2),
        "unit": "frames/sec",
        "ms_per_frame": round(times[0] * 1000, 3),
        "mtri_per_sec": round(triangles * fps / 1e6, 2),
        "runs_ms": [round(t * 1000, 3) for t in times],
        "median_ms": round(times[len(times) // 2] * 1000, 3),
        "max_ms": round(times[-1] * 1000, 3),
        "overflow": bool(ovf.any()),
    }


def extra_headline_rows(backend: str) -> list:
    """The other two BASELINE.md headline configs: 4K/1M+10k-instance
    stress and the 8K demo. Best-effort — a failure in one row reports
    an error field instead of killing the headline metric."""
    rows = []
    try:
        from myrenderer_tpu.app.stress import StressApp
        app = StressApp(width=3840, height=2160, terrain_size=708,
                        instances=10000, backend=backend)
        row = {"metric": "stress_4k_1m_fps",
               **_timed_rows(app, frames=4, runs=3,
                             triangles=app.triangles)}
        if row.pop("overflow"):
            row = {"metric": "stress_4k_1m_fps", "value": None,
                   "error": "overflow during timed loop"}
        rows.append(row)
        del app
    except Exception as exc:
        rows.append({"metric": "stress_4k_1m_fps", "value": None,
                     "error": repr(exc)[:200]})
    try:
        app = DemoApp(width=7680, height=4320, backend=backend)
        row = {"metric": "demo_8k_fps",
               **_timed_rows(app, frames=30, runs=3,
                             triangles=DEMO_TRIANGLES)}
        if row.pop("overflow"):
            row = {"metric": "demo_8k_fps", "value": None,
                   "error": "overflow during timed loop"}
        rows.append(row)
    except Exception as exc:
        rows.append({"metric": "demo_8k_fps", "value": None,
                     "error": repr(exc)[:200]})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--size", default=None, help="override WxH")
    ap.add_argument("--headline-only", action="store_true",
                    help="skip the stress/8K extra rows")
    args = ap.parse_args()

    if os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu") \
            and not probe_backend():
        print("TPU backend unavailable (probe timed out) — no honest "
              "measurement possible", file=sys.stderr)
        print(json.dumps({"metric": "demo_1080p_fps", "value": None,
                          "unit": "frames/sec", "vs_baseline": None,
                          "error": "tpu backend unavailable"}))
        return

    if args.smoke:
        w, h, frames = 256, 256, 10
    else:
        w, h, frames = 1920, 1080, args.frames
    if args.size:
        w, h = (int(v) for v in args.size.split("x"))

    backend = "pallas" if jax.default_backend() != "cpu" else "oracle"
    app = DemoApp(width=w, height=h, backend=backend)
    times = measure(app, frames)
    spf = times[0]
    fps = 1.0 / spf
    mtris = DEMO_TRIANGLES * fps / 1e6

    try:
        base_fps = cpu_oracle_baseline(w, h)
        vs_baseline = fps / base_fps
    except Exception as exc:  # baseline measurement is best-effort
        print(f"baseline measurement failed: {exc}", file=sys.stderr)
        base_fps, vs_baseline = None, None

    print(f"# {w}x{h} {backend} on {jax.default_backend()}: "
          f"{spf * 1000:.2f} ms/frame, {mtris:.1f} Mtri/s submitted, "
          f"cpu-oracle baseline: "
          f"{base_fps if base_fps else 'n/a'} fps",
          file=sys.stderr)

    metric = "demo_1080p_fps" if (w, h) == (1920, 1080) else \
        f"demo_{w}x{h}_fps"
    result = {
        "metric": metric,
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        # spread of the 5 runs for regression forensics (ADVICE r3):
        # the headline is min-of-5 (one-sided relay noise); a bimodal
        # device-side regression shows up here as median/max blowup
        "runs_ms": [round(t * 1000, 3) for t in times],
        "median_ms": round(times[len(times) // 2] * 1000, 3),
        "max_ms": round(times[-1] * 1000, 3),
    }
    if not (args.smoke or args.size or args.headline_only):
        result["extra_metrics"] = extra_headline_rows(backend)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
