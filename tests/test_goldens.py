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


def test_demo_frame1_golden():
    app = DemoApp(width=128, height=128, backend="oracle")
    app.run(1)
    got = app.window.read_pixels()
    want = load_rgba8(os.path.join(GOLDEN_DIR, "demo_128_frame1.png"))
    # quantized to uint8: allow 1 step of fp jitter, but require 99.9%
    # exact (catches any real rendering change)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999


def test_demo_frame31_golden():
    app = DemoApp(width=128, height=128, backend="oracle")
    app.run(31)
    got = app.window.read_pixels()
    want = load_rgba8(os.path.join(GOLDEN_DIR, "demo_128_frame31.png"))
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999
