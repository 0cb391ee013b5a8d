"""Renderer framework public surface (``Renderer/Renderer.zig:9-15``):
VertexLayout, Pipeline, Instance, VertexBuffer, Surface, SceneNode,
Draw, plus the Renderer core (clock + registries) and the headless
Core/Window runtime."""

from .core import Core, Event, Renderer, Window
from .draw import Draw
from .instance import Binding, Instance
from .pipeline import (BUILTIN_TRANSFORM, MANAGED_STORAGE, MANAGED_UNIFORM,
                       TEXTURE_SAMPLER, TEXTURE_VIEW, UNMANAGED_BUFFER,
                       BindingLayout, Pipeline, VertexLayout,
                       default_fragment_fn)
from .scene import SceneNode
from .surface import Surface
from .vertex import VertexBuffer

__all__ = [
    "Core", "Event", "Renderer", "Window", "Draw", "Binding", "Instance",
    "BindingLayout", "Pipeline", "VertexLayout", "default_fragment_fn",
    "SceneNode", "Surface", "VertexBuffer",
    "BUILTIN_TRANSFORM", "MANAGED_STORAGE", "MANAGED_UNIFORM",
    "TEXTURE_SAMPLER", "TEXTURE_VIEW", "UNMANAGED_BUFFER",
]
