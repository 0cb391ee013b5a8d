"""Surface: a render target — window framebuffer + depth + scene root +
projection.

Mirrors ``Renderer/Surface.zig``: ``create_window_scene`` (:35-42),
``set_perspective`` (:49-51), resize-aware rebuild (:76-94), and the
per-frame dedupe guard (:136-138) — implemented *working* here (the
reference never updates the surface's counter, so its guard is inert;
SURVEY.md §2.5).

The depth buffer is per-surface state cleared to 1.0 at the start of its
render (:103-133); it lives only inside the jitted frame function, so
the Surface itself just records dimensions.
"""

from __future__ import annotations

import numpy as np

from .core import Window
from .scene import SceneNode

WINDOW_SCENE = "window_scene"
# declared-but-stubbed targets in the reference (Surface.zig:11-33)
WINDOW_COMPOSE = "window_compose"
SUB_COMPOSE = "sub_compose"
VR_SCENE = "vr_scene"


class Surface:
    def __init__(self, renderer, window: Window, base_node: SceneNode):
        self.renderer = renderer
        self.target = WINDOW_SCENE
        self.window = window
        self.base_node = base_node
        self.perspective_matrix = np.eye(4, dtype=np.float32)
        self.dimensions = (0, 0)
        self.frame_counter = 0  # dedupe: drawn at most once per frame
        self.rebuild()
        self.id = renderer._register(renderer.surfaces, self)

    @staticmethod
    def create_window_scene(renderer, window: Window,
                            base_node: SceneNode) -> "Surface":
        return Surface(renderer, window, base_node)

    # reference spelling (Surface.zig:35)
    createWindowScene = create_window_scene

    def set_perspective(self, perspective) -> None:
        self.perspective_matrix = np.asarray(perspective,
                                             np.float32).reshape(4, 4)

    def rebuild(self) -> None:
        """Re-adopt the window's size (depth texture recreation in the
        reference, ``Surface.zig:76-94``; here just dimensions — the
        depth array is allocated inside the frame program)."""
        dims = (self.window.width, self.window.height)
        if dims != self.dimensions:
            self.dimensions = dims
            if hasattr(self, "id"):
                self.renderer.bump_scene_version()

    def resize(self, new_size) -> None:
        """``Surface.zig:96-101`` (fixed: the reference version calls a
        stale rebuild signature)."""
        w, h = int(new_size[0]), int(new_size[1])
        if (w, h) != self.dimensions:
            self.window.resize(w, h)
            self.rebuild()

    def deinit(self) -> None:
        """``Surface.zig:159-178`` intent (the reference's version
        switches on nonexistent union variants): drop from the
        registry; device buffers are GC'd."""
        if self in self.renderer.surfaces:
            self.renderer.surfaces.remove(self)
            self.renderer.bump_scene_version()
