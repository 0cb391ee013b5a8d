"""Instance: a drawable — pipeline + bound resources + vertex buffer.

Mirrors ``Renderer/Instance.zig``: ``create_node`` registers an Instance
and a SceneNode whose render emits its draw (:81-154); ``update_buffer``
writes into the instance's managed binding storage (:165-187);
``set_vertex_buffer`` swaps the draw source (:189-198).

Managed bindings are host staging arrays (flat f32, byte-addressed like
the reference's pooled GPU buffer) converted to device arrays on demand,
version-cached. The x4 ring buffering (``MAX_COPIES``, :53) exists in
the reference to let the CPU write frame N+1 while the GPU reads frame N;
a functional jitted step has no such race, so one logical copy suffices
— the renderer still cycles ``current_buffer_slot`` for API parity.

The builtin ``transform`` binding (``Pipeline.zig:47-49``) is not stored:
it is the composed node transform, computed on device per frame and
handed to the vertex function as ``ctx.world``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from . import pipeline as pl
from .scene import SceneNode
from .vertex import VertexBuffer


@dataclass
class Binding:
    """Per-instance binding description (``Instance.zig:16-31``): a
    location and a byte size for managed storage (attachments — external
    buffers/textures — arrive as explicit arrays)."""

    location: int
    size: int = 0
    attachment: Optional[np.ndarray] = None


class _ManagedStore:
    """Flat f32 staging for one managed binding (byte-addressed writes,
    like queue.writeBuffer at Instance.zig:185)."""

    def __init__(self, size_bytes: int):
        if size_bytes % 4:
            raise ValueError("binding size must be a multiple of 4 bytes")
        self.host = np.zeros(size_bytes // 4, np.float32)
        self.version = 0
        self._device = None
        self._device_version = -1

    def write(self, byte_offset: int, value) -> None:
        flat = np.asarray(value, np.float32).reshape(-1)
        if byte_offset % 4:
            raise ValueError("byte offset must be 4-aligned")
        start = byte_offset // 4
        if start + flat.size > self.host.size:
            raise ValueError("update_buffer write out of bounds")
        self.host[start:start + flat.size] = flat
        self.version += 1

    def device_array(self):
        if self._device_version != self.version:
            self._device = jnp.asarray(self.host)
            self._device_version = self.version
        return self._device


class Instance:
    def __init__(self, renderer, pipeline: pl.Pipeline,
                 bindings: Sequence[Binding]):
        self.renderer = renderer
        self.pipeline = pipeline
        self.vertex_buffer = VertexBuffer(primitive_count=1)  # default: 3 verts, no buffer (VertexBuffer.zig:5-9)
        self.stores: dict[int, _ManagedStore] = {}
        self.attachments: dict[int, np.ndarray] = {}

        given = {b.location: b for b in bindings}
        for layout in pipeline.bindings:
            if layout.kind == pl.BUILTIN_TRANSFORM:
                continue  # synthesized per frame
            b = given.get(layout.location)
            if b is None:
                raise ValueError(
                    f"pipeline binding location {layout.location} "
                    f"({layout.kind}) has no Binding supplied")
            if b.attachment is not None:
                self.attachments[layout.location] = np.asarray(
                    b.attachment, np.float32)
            else:
                self.stores[layout.location] = _ManagedStore(b.size)
        self.id = renderer._register(renderer.instances, self)

    @staticmethod
    def create_node(renderer, *, pipeline: pl.Pipeline,
                    bindings: Sequence[Binding] = (),
                    bounding_box_p0=None,
                    bounding_box_p1=None) -> SceneNode:
        """``Instance.createNode`` (``Instance.zig:81-154``): registers
        the instance and wraps it in a SceneNode."""
        inst = Instance(renderer, pipeline, bindings)
        node = SceneNode(renderer, backing_instance=inst)
        if bounding_box_p0 is not None and bounding_box_p1 is not None:
            node.set_bounding_box(bounding_box_p0, bounding_box_p1)
        return node

    # reference spelling (Instance.zig:81)
    createNode = create_node

    # -- runtime updates (Instance.zig:165-198) ------------------------------

    def update_buffer(self, location: int, value, byte_offset: int = 0) -> None:
        """Write into a managed binding's storage. f32 payloads only —
        integers the shader needs (e.g. the terrain's size field) are
        stored as their float value and cast in the vertex function."""
        if location not in self.stores:
            raise ValueError(f"location {location} is not a managed binding")
        self.stores[location].write(byte_offset, value)

    def set_vertex_buffer(self, vertex_buffer: VertexBuffer) -> None:
        self.vertex_buffer = vertex_buffer
        self.renderer.bump_scene_version()

    def binding_device_array(self, location: int):
        if location in self.stores:
            return self.stores[location].device_array()
        return jnp.asarray(self.attachments[location])

    def destroy(self) -> None:
        if self in self.renderer.instances:
            self.renderer.instances.remove(self)
            self.renderer.bump_scene_version()
