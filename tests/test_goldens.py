"""Golden-image regression tests: the demo scene must keep producing
exactly these frames (oracle backend, fixed timestep). Regenerate the
PNGs deliberately (see command in the repo history) if a rendering
change is intended."""

import os

import numpy as np
import pytest

from myrenderer_tpu.app.demo import DemoApp
from myrenderer_tpu.utils.png import load_rgba8

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.mark.parametrize("backend", ["oracle", "pallas"])
@pytest.mark.parametrize("frame", [1, 31])
def test_demo_frame_golden(backend, frame):
    """Both backends must reproduce the same goldens: the pallas path
    (interpret mode on CPU) is decision-identical to the oracle, and
    uint8 quantization absorbs its ≤1-ulp interpolation differences."""
    app = DemoApp(width=128, height=128, backend=backend)
    app.run(frame)
    got = app.window.read_pixels()
    want = load_rgba8(os.path.join(GOLDEN_DIR,
                                   f"demo_128_frame{frame}.png"))
    # quantized to uint8: allow 1 step of fp jitter, but require 99.9%
    # exact (catches any real rendering change)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999


@pytest.mark.parametrize("backend", ["oracle", "pallas"])
def test_textured_fragment_golden(backend):
    """Fragment-stage texture sampling golden: a quad shaded by a
    two-parameter fragment program sampling a 4x4 checker at the
    interpolated per-pixel UV (FragmentCtx — the capability the
    reference's texture_view/texture_sampler binding kinds imply,
    Pipeline.zig:34-55). Both backends must reproduce the frame."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_render_e2e import (_checker_texture, _textured_quad,
                                 make_renderer, ortho_unit, render_frame)

    from myrenderer_tpu import Surface

    rend, window = make_renderer(128, 128, backend=backend)
    node = _textured_quad(rend, _checker_texture(4))
    surf = Surface.create_window_scene(rend, window, node)
    surf.set_perspective(ortho_unit())
    render_frame(rend, [surf], clear=(0, 0, 1, 1))
    got = window.read_pixels()
    want = load_rgba8(os.path.join(GOLDEN_DIR, "textured_128.png"))
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999
