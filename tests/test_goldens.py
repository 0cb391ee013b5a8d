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
