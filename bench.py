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
    """min/median/max row over ``runs`` timed runs + overflow guard.

    The guard must catch a TRANSIENT overflow, not just the final
    frame's flag: any detected overflow bumps the capacity ladder
    (Draw._big_scale), so the pre/post scale delta witnesses drops the
    loop already repaired, and the still-queued async flags are drained
    and read after timing (a final-flag-only check reported such runs
    as clean while up to OVERFLOW_WINDOW timed frames had dropped
    triangles)."""
    import numpy as np
    app.tick()   # settle warmup/capacity OUTSIDE the guard window
    jax.block_until_ready(app.window.framebuffer)
    scale0 = app.draw._big_scale
    times = measure(app, frames, runs=runs)
    overflow = app.draw._big_scale != scale0
    flags = list(app.draw._pending_overflow)
    if app.draw.last_overflow is not None:
        flags.append(app.draw.last_overflow)
    overflow = overflow or any(bool(np.asarray(f).any()) for f in flags)
    fps = 1.0 / times[0]
    return {
        "value": round(fps, 2),
        "unit": "frames/sec",
        "ms_per_frame": round(times[0] * 1000, 3),
        "mtri_per_sec": round(triangles * fps / 1e6, 2),
        "runs_ms": [round(t * 1000, 3) for t in times],
        "median_ms": round(times[len(times) // 2] * 1000, 3),
        "max_ms": round(times[-1] * 1000, 3),
        "overflow": overflow,
    }


def _guarded_row(metric: str, app, frames: int, runs: int,
                 triangles: int) -> dict:
    """A named row whose value is nulled on overflow — a frame that
    dropped triangles must not masquerade as a perf win."""
    row = {"metric": metric,
           **_timed_rows(app, frames=frames, runs=runs,
                         triangles=triangles)}
    if row.pop("overflow"):
        return {"metric": metric, "value": None,
                "error": "overflow during timed loop"}
    return row


def extra_headline_rows(backend: str) -> list:
    """The other two BASELINE.md headline configs: 4K/1M+10k-instance
    stress and the 8K demo. Best-effort — a failure in one row reports
    an error field instead of killing the headline metric. Callers must
    gate on an accelerator backend: these scenes are computationally
    infeasible on the dense CPU oracle (hours per frame)."""
    rows = []
    try:
        from myrenderer_tpu.app.stress import StressApp
        app = StressApp(width=3840, height=2160, terrain_size=708,
                        instances=10000, backend=backend)
        rows.append(_guarded_row("stress_4k_1m_fps", app, frames=4,
                                 runs=3, triangles=app.triangles))
        del app
    except Exception as exc:
        rows.append({"metric": "stress_4k_1m_fps", "value": None,
                     "error": repr(exc)[:200]})
    try:
        app = DemoApp(width=7680, height=4320, backend=backend)
        rows.append(_guarded_row("demo_8k_fps", app, frames=30,
                                 runs=3, triangles=DEMO_TRIANGLES))
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
    metric = "demo_1080p_fps" if (w, h) == (1920, 1080) else \
        f"demo_{w}x{h}_fps"
    # headline = min-of-5 with the runs_ms spread for regression
    # forensics (ADVICE r3: min alone hides a bimodal device-side
    # regression); same overflow-nulling rule as the extra rows
    row = _guarded_row(metric, app, frames=frames, runs=5,
                       triangles=DEMO_TRIANGLES)

    try:
        base_fps = cpu_oracle_baseline(w, h)
        vs_baseline = (row["value"] / base_fps) if row.get("value") \
            else None
    except Exception as exc:  # baseline measurement is best-effort
        print(f"baseline measurement failed: {exc}", file=sys.stderr)
        base_fps, vs_baseline = None, None

    print(f"# {w}x{h} {backend} on {jax.default_backend()}: "
          f"{row.get('ms_per_frame', 'n/a')} ms/frame, "
          f"{row.get('mtri_per_sec', 'n/a')} Mtri/s submitted, "
          f"cpu-oracle baseline: "
          f"{base_fps if base_fps else 'n/a'} fps",
          file=sys.stderr)

    result = {
        **row,
        "unit": "frames/sec",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }
    # the stress/8K scenes are computationally infeasible on the dense
    # CPU oracle (hours per frame) — accelerator runs only
    if not (args.smoke or args.size or args.headline_only) \
            and backend == "pallas":
        result["extra_metrics"] = extra_headline_rows(backend)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
