"""CPU tests for the stretch-config stress app (BASELINE.json
config[4]: 4K / 1M-triangle terrain / 10k instances in ONE draw) and
the utils.profiling helpers (SURVEY.md §5.1).

The stress app's headline numbers are hardware-only (BASELINE.md), but
its *structure* — the instanced marker draw (``VertexBuffer.zig:7``'s
``instance_count`` generalized), the MANAGED_STORAGE heightmap binding
read per draw-instance via ``ctx.binding_at``, and the shared camera
transform — must hold at any scale, so we pin it tiny on CPU with
oracle-vs-pallas pixel parity.
"""

import time

import numpy as np
import pytest

from myrenderer_tpu.app.stress import StressApp
from myrenderer_tpu.utils.profiling import FrameTimer

SIZE = 96          # framebuffer, px
TERRAIN = 48       # 48x48 heightmap -> 4608 terrain triangles (the
                   # camera orbit formula targets production scale;
                   # smaller terrains leave the frame mostly clear)
INSTANCES = 16     # 4x4 marker grid, one instanced draw
MARKER = np.array([1.0, 0.4, 0.2, 1.0])   # stress.py marker color


def tiny_app(backend):
    return StressApp(width=SIZE, height=SIZE, terrain_size=TERRAIN,
                     instances=INSTANCES, backend=backend)


class TestStressScene:
    @pytest.fixture(scope="class")
    def frames(self):
        fb_p = np.asarray(tiny_app("pallas").tick())
        fb_o = np.asarray(tiny_app("oracle").tick())
        return fb_p, fb_o

    def test_triangle_budget(self):
        app = tiny_app("pallas")
        assert app.triangles == TERRAIN * TERRAIN * 2 + INSTANCES

    def test_markers_rendered(self, frames):
        fb_p, _ = frames
        # the orange markers stand above the gray terrain; at least a
        # few pixels must carry the exact flat marker color (default
        # passthrough fragment, constant varying)
        hits = np.isclose(fb_p, MARKER, atol=1e-4).all(axis=-1).sum()
        assert hits >= INSTANCES, hits

    def test_terrain_rendered(self, frames):
        fb_p, _ = frames
        # grayscale terrain pixels (r == g == b, not clear color)
        r, g, b = fb_p[..., 0], fb_p[..., 1], fb_p[..., 2]
        gray = (r == g) & (g == b) & (r > 0.05)
        assert gray.sum() > 400   # measured 813 at this scale

    def test_oracle_pallas_parity(self, frames):
        fb_p, fb_o = frames
        # decision-grade parity at tiny scale: both backends share
        # raster_common's rulebook, so pixels agree except (rarely) at
        # exact triangle-edge ties
        diff = ~np.isclose(fb_p, fb_o, atol=1e-4).all(axis=-1)
        assert diff.mean() < 0.005, f"{diff.sum()} differing pixels"

    def test_no_overflow_and_finite(self, frames):
        fb_p, _ = frames
        assert np.isfinite(fb_p).all()
        app = tiny_app("pallas")
        app.tick()
        assert not np.asarray(app.draw.last_overflow).any()

    def test_camera_orbits(self):
        app = tiny_app("pallas")
        fb1 = np.asarray(app.tick())
        for _ in range(30):            # fixed_timestep advances 0.5 s
            app.renderer.update()
        fb2 = np.asarray(app.tick())
        assert not np.array_equal(fb1, fb2)


class TestFrameTimer:
    def test_rolling_window(self, monkeypatch):
        clock = iter(np.arange(0.0, 10.0, 0.01))
        monkeypatch.setattr(time, "perf_counter", lambda: next(clock))
        ft = FrameTimer(window=4)
        assert np.isnan(ft.ms_per_frame)   # no samples yet
        for _ in range(8):
            ft.tick()
        assert len(ft.samples) == 4        # window capped
        assert ft.ms_per_frame == pytest.approx(10.0, rel=1e-6)
        assert ft.fps == pytest.approx(100.0, rel=1e-6)

    def test_first_tick_records_nothing(self):
        ft = FrameTimer()
        ft.tick()
        assert ft.samples == []
        assert np.isnan(ft.fps)
