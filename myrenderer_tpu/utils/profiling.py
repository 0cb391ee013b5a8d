"""Profiling helpers (SURVEY.md §5.1: jax.profiler traces + per-stage
timers replacing the reference's ad-hoc debug prints)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace around a block (view with
    TensorBoard or Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class FrameTimer:
    """Rolling frame-time stats (host wall clock, block-fenced by the
    caller)."""

    def __init__(self, window: int = 120):
        self.window = window
        self.samples: list[float] = []
        self._last = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.samples.append(now - self._last)
            if len(self.samples) > self.window:
                self.samples.pop(0)
        self._last = now

    @property
    def ms_per_frame(self) -> float:
        if not self.samples:
            return float("nan")
        return 1000.0 * sum(self.samples) / len(self.samples)

    @property
    def fps(self) -> float:
        ms = self.ms_per_frame
        return 1000.0 / ms if ms > 0 else float("nan")
