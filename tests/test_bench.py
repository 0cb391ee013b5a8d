"""bench.py overflow-guard rows (driver metric pipeline).

The guard must catch a TRANSIENT capacity overflow during the timed
loop, not just the final frame's flag: a detected overflow bumps the
capacity ladder mid-loop and later frames run clean, so a
final-flag-only check would report the run as a perf win even though
up to OVERFLOW_WINDOW timed frames published dropped triangles
(round-5 review finding). Uses a stub app so no rendering happens —
the row shape and guard logic are what's under test."""

import jax.numpy as jnp

import bench


class _StubDraw:
    def __init__(self, big_scale=1, pending=(), last=None):
        self._big_scale = big_scale
        self._pending_overflow = list(pending)
        self.last_overflow = last


class _StubWindow:
    framebuffer = jnp.zeros((2, 2, 4), jnp.float32)


class _StubApp:
    """tick() is a no-op; the draw attrs are poked per test case."""

    def __init__(self, draw):
        self.draw = draw
        self.window = _StubWindow()
        self.ticks = 0

    def tick(self):
        self.ticks += 1


FLAG_CLEAN = jnp.zeros((3,), bool)
FLAG_HIT = jnp.array([False, True, False])


def _row(app):
    return bench._guarded_row("m", app, frames=2, runs=2, triangles=7)


def test_clean_run_keeps_value_and_spread():
    app = _StubApp(_StubDraw(last=FLAG_CLEAN, pending=[FLAG_CLEAN]))
    row = _row(app)
    assert row["metric"] == "m" and row["value"] is not None
    assert "error" not in row
    assert len(row["runs_ms"]) == 2
    assert row["runs_ms"] == sorted(row["runs_ms"])
    assert {"median_ms", "max_ms", "mtri_per_sec"} <= row.keys()


def test_final_frame_flag_nulls_value():
    app = _StubApp(_StubDraw(last=FLAG_HIT))
    row = _row(app)
    assert row["value"] is None and row["error"]


def test_queued_async_flag_nulls_value():
    """An overflow whose flag is still in the async queue (undrained
    within the last OVERFLOW_WINDOW frames) must not read as clean."""
    app = _StubApp(_StubDraw(last=FLAG_CLEAN,
                             pending=[FLAG_CLEAN, FLAG_HIT]))
    row = _row(app)
    assert row["value"] is None and row["error"]


def test_midloop_capacity_bump_nulls_value():
    """A detected-and-repaired overflow leaves clean flags behind; the
    capacity-ladder scale delta is the witness."""
    draw = _StubDraw(last=FLAG_CLEAN)

    class BumpingApp(_StubApp):
        def tick(self):
            super().tick()
            if self.ticks == 3:      # after the guard-window snapshot
                self.draw._big_scale *= 4

    row = _row(BumpingApp(draw))
    assert row["value"] is None and row["error"]


def test_oracle_backend_without_flags_is_clean():
    """last_overflow=None (oracle backend / no raster plan) must not
    crash the guard."""
    app = _StubApp(_StubDraw(last=None))
    row = _row(app)
    assert row["value"] is not None and "error" not in row
