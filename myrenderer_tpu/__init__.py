"""myrenderer_tpu — a TPU-native rendering framework.

A from-scratch re-design of the capabilities of platypro/myrenderer
(a Zig/WebGPU scene-graph renderer) for TPU hardware: the retained
scene/object API runs on the host; each frame executes as one jitted
JAX/XLA program over HBM-resident framebuffers, with tiled Pallas
kernels for rasterization. See SURVEY.md for the layer-by-layer map.
"""

from . import math3d
from .renderer import (Binding, BindingLayout, Core, Draw, Instance,
                       Pipeline, Renderer, SceneNode, Surface, VertexBuffer,
                       VertexLayout, Window)

__all__ = [
    "math3d", "Binding", "BindingLayout", "Core", "Draw", "Instance",
    "Pipeline", "Renderer", "SceneNode", "Surface", "VertexBuffer",
    "VertexLayout", "Window",
]

__version__ = "0.1.0"
