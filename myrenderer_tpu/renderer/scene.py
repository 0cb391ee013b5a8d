"""SceneNode: hierarchical scene graph with transforms, AABBs and
conservative culling.

Mirrors ``Renderer/SceneNode.zig``: per-node local transform,
axis-aligned bounding box, child lists, and the dirty flag set by
``set_xform`` (:42-45). The recursive render walk (:91-132) is replaced
by a flattened structure-of-arrays schedule consumed on device
(``ops/vertex_stage.py``); traversal order — instance first, then
children in add order — is preserved when the frame program collects
draw items.

Intent-not-bugs fixes (SURVEY.md §2.5): ``set_bounding_box`` works (the
reference set a nonexistent field), ``remove_child`` recomputes the
parent box from remaining children with ±inf seeds (not zeros), and
culling is a correct conservative clip-space test (the reference's was
inert).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

_INF = float("inf")


class SceneNode:
    def __init__(self, renderer, backing_instance=None):
        self.renderer = renderer
        self.backing_instance = backing_instance
        self.parent: Optional["SceneNode"] = None
        self.children: list[SceneNode] = []
        self.xform = np.eye(4, dtype=np.float32)
        self.bounding_box_p0 = np.array([-_INF, -_INF, -_INF], np.float32)
        self.bounding_box_p1 = np.array([+_INF, +_INF, +_INF], np.float32)
        self.updated = False
        self.index = renderer._register(renderer.scene_nodes, self)

    @staticmethod
    def create(renderer, backing_instance=None) -> "SceneNode":
        """``SceneNode.create`` (``SceneNode.zig:139-141``)."""
        return SceneNode(renderer, backing_instance)

    # -- mutation (SceneNode.zig:42-65) --------------------------------------

    def set_xform(self, xform) -> None:
        self.xform = np.asarray(xform, np.float32).reshape(4, 4)
        self.updated = False  # dirty flag semantics of :42-45

    def set_bounding_box(self, p0, p1) -> None:
        self.bounding_box_p0 = np.asarray(p0, np.float32).reshape(3)
        self.bounding_box_p1 = np.asarray(p1, np.float32).reshape(3)
        self.updated = False
        self.renderer.bump_bounds_version()

    def add_child(self, child: "SceneNode") -> None:
        """Union the child's AABB into this node's (``:54-65``)."""
        if child.parent is not None:
            raise ValueError("node already has a parent")
        self.bounding_box_p0 = np.minimum(self.bounding_box_p0,
                                          child.bounding_box_p0)
        self.bounding_box_p1 = np.maximum(self.bounding_box_p1,
                                          child.bounding_box_p1)
        self.updated = False
        child.parent = self
        self.children.append(child)
        self.renderer.bump_scene_version()

    def remove_child(self, child: "SceneNode") -> None:
        self.children.remove(child)
        child.parent = None
        p0 = np.array([+_INF] * 3, np.float32)
        p1 = np.array([-_INF] * 3, np.float32)
        for c in self.children:
            p0 = np.minimum(p0, c.bounding_box_p0)
            p1 = np.maximum(p1, c.bounding_box_p1)
        if self.children:
            self.bounding_box_p0, self.bounding_box_p1 = p0, p1
        else:
            self.bounding_box_p0 = np.array([-_INF] * 3, np.float32)
            self.bounding_box_p1 = np.array([+_INF] * 3, np.float32)
        self.renderer.bump_scene_version()

    # -- queries -------------------------------------------------------------

    @property
    def has_finite_aabb(self) -> bool:
        return bool(np.all(np.isfinite(self.bounding_box_p0))
                    and np.all(np.isfinite(self.bounding_box_p1)))

    def get_backing(self):
        """``SceneNode.zig:134-136``."""
        if self.backing_instance is None:
            raise ValueError("node has no backing instance")
        return self.backing_instance

    def walk(self):
        """Pre-order traversal in render order (``SceneNode.zig:119-128``:
        a node draws its instance, then children in add order)."""
        yield self
        for c in self.children:
            yield from c.walk()
