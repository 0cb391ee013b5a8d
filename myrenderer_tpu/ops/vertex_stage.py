"""Device-side scene math: transform composition, conservative culling,
batched vertex transform (all jnp, runs inside the jitted frame).

Replaces the reference's pointer-chasing scene recursion
(``Renderer/SceneNode.zig:91-132``) with level-scheduled batched 4x4
matmuls over a structure-of-arrays node table, and its per-vertex WGSL
shader execution (``Pipeline.zig:95-98``) with a ``jax.vmap`` of the
pipeline's Python vertex function.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def compose_world_transforms(locals_: jax.Array,
                             levels: Sequence[np.ndarray],
                             parents: np.ndarray) -> jax.Array:
    """Compose hierarchical node transforms.

    locals_: f32[N, 4, 4] local transforms in node-table order.
    levels: static schedule — arrays of node indices at depth 1, 2, ...
    (depth-0 roots keep their local transform). parents: i32[N].

    world[n] = world[parent[n]] @ local[n]  — the composition order of
    ``SceneNode.zig:96`` (``Mat.mul(&pass.xform, &node.xform)``).
    """
    world = locals_
    for idxs in levels:
        if len(idxs) == 0:
            continue
        p = parents[idxs]
        upd = jnp.einsum("nij,njk->nik", world[p], locals_[idxs])
        world = world.at[idxs].set(upd)
    return world


def cull_aabb(clip_mats: jax.Array, aabb_min: jax.Array,
              aabb_max: jax.Array, finite: jax.Array) -> jax.Array:
    """Conservative frustum culling (the *intent* of ``SceneNode.zig:111``,
    whose any-corner test is effectively always-true — SURVEY.md §2.5).

    clip_mats: f32[I, 4, 4] (projection @ world), aabb_min/max: f32[I, 3],
    finite: bool[I] (False => infinite default AABB => always visible).

    A box is culled only when all 8 corners are outside one clip
    half-space (x,y in [-w, w], z in [0, w] — WebGPU conventions).
    Conservative: may render invisible geometry, never culls visible.
    """
    corners = jnp.stack([
        jnp.stack([
            jnp.where(jnp.array([(k >> 0) & 1, (k >> 1) & 1, (k >> 2) & 1],
                                bool), aabb_max, aabb_min)
            for k in range(8)
        ], axis=1)  # [I, 8, 3]
    ], axis=0)[0]
    ones = jnp.ones(corners.shape[:-1] + (1,), corners.dtype)
    hom = jnp.concatenate([corners, ones], axis=-1)      # [I, 8, 4]
    cc = jnp.einsum("iab,ikb->ika", clip_mats, hom)       # [I, 8, 4]
    x, y, z, w = cc[..., 0], cc[..., 1], cc[..., 2], cc[..., 3]
    outside = (jnp.all(x < -w, axis=1) | jnp.all(x > w, axis=1)
               | jnp.all(y < -w, axis=1) | jnp.all(y > w, axis=1)
               | jnp.all(z < 0, axis=1) | jnp.all(z > w, axis=1))
    return jnp.where(finite, ~outside, True)


def bitcast_u32(x: jax.Array) -> jax.Array:
    """Reinterpret f32 bits as u32 — how vertex/fragment functions read
    integer struct fields out of managed bindings (the analogue of a
    WGSL ``u32`` uniform member, e.g. ``Terrain.zig:56`` ``size: u32``).
    Bit-exact: managed stores stage integer payloads as raw bits."""
    return jax.lax.bitcast_convert_type(jnp.asarray(x, jnp.float32),
                                        jnp.uint32)


def bitcast_f32(x: jax.Array) -> jax.Array:
    """Inverse of :func:`bitcast_u32`."""
    return jax.lax.bitcast_convert_type(jnp.asarray(x), jnp.float32)


class VertexCtx:
    """Per-vertex inputs handed to a pipeline's vertex function (the
    analogue of WGSL @builtin/@location inputs + bind groups).

    Inside ``vmap``: ``vertex_index`` is a scalar i32, ``attrs`` maps
    attribute names to f32[k] vectors, ``world`` is the composed f32[4,4]
    transform (the 'builtin transform' binding,
    ``Pipeline.zig:47-49``), ``instance_id`` indexes stacked binding
    arrays: ``binding(loc)`` returns that instance's value.
    """

    def __init__(self, vertex_index, attrs, world, instance_id, bindings,
                 draw_instance=None):
        self.vertex_index = vertex_index
        self.attrs = attrs
        self.world = world
        self.instance_id = instance_id
        # @builtin(instance_index) analogue: which draw-instance of an
        # instanced draw this vertex belongs to (VertexBuffer.zig:7)
        self.draw_instance = draw_instance
        self._bindings = bindings

    def attr(self, name):
        return self.attrs[name]

    def binding(self, location: int):
        """This instance's value for binding ``location``. The stacked
        [I, ...] array is indexed by instance id; XLA fuses the row
        gather into downstream use."""
        return self._bindings[location][self.instance_id]

    def binding_at(self, location: int, index):
        """Single-element fetch ``binding(location)[index]`` as ONE
        fused 2-D gather. Prefer this under vmap when the binding is
        large: chained indexing can materialize a per-vertex copy of the
        whole row (observed as a V x row_size broadcast = OOM)."""
        return self._bindings[location][self.instance_id, index]

    def binding_stacked(self, location: int):
        """The raw stacked [I, ...] array (for custom gathers)."""
        return self._bindings[location]


class FragmentCtx:
    """Fragment-stage resources, handed to two-parameter fragment
    functions as ``fragment_fn(varyings, ctx)``.

    In WebGPU the texture_view / texture_sampler binding kinds the
    reference declares (``Pipeline.zig:34-55``, sampler created at
    :107-115) are FRAGMENT-stage resources; this is their access path
    on the shading side. ``binding(loc)`` returns the drawn instance's
    value for that slot — an attachment (e.g. an f32[H, W, C] texture
    for :mod:`..ops.sampling`) or a managed/unmanaged buffer.

    Unlike :class:`VertexCtx` there is no instance-id indexing: a
    pipeline whose fragment function takes a ctx gets ONE draw batch
    per instance (``draw._build_batches``), because the winner-id range
    that routes pixels to this program is per-batch — near-plane
    straddlers clip into a per-batch appendee block whose slots carry
    no per-instance attribution.
    """

    def __init__(self, bindings):
        self._bindings = bindings

    def binding(self, location: int):
        return self._bindings[location]


class BatchVertexCtx:
    """Whole-stream inputs for a *batched* vertex function (the analogue
    of a mesh/compute shader): ``vertex_index`` i32[V], ``attrs`` maps
    names to f32[V, k], ``worlds`` f32[I, 4, 4], ``iids`` i32[V],
    ``binding(loc)`` returns the stacked [I, ...] array."""

    def __init__(self, vertex_index, attrs, worlds, iids, bindings,
                 draw_instances=None):
        self.vertex_index = vertex_index
        self.attrs = attrs
        self.worlds = worlds
        self.iids = iids
        self.draw_instances = draw_instances
        self._bindings = bindings

    def attr(self, name):
        return self.attrs[name]

    def binding(self, location: int):
        return self._bindings[location]


def run_vertex_stage(vertex_fn: Callable, vertex_index: jax.Array,
                     attrs: dict, worlds: jax.Array, iids: jax.Array,
                     bindings: dict,
                     vertex_batch_fn: Callable | None = None,
                     draw_instances: jax.Array | None = None
                     ) -> tuple[jax.Array, jax.Array]:
    """Run the vertex stage over a packed vertex stream.

    vertex_index: i32[V]; attrs: name -> f32[V, k]; worlds: f32[I, 4, 4];
    iids: i32[V]; bindings: loc -> stacked [I, ...] arrays.
    Returns (clip f32[V, 4], varyings f32[V, C]).

    When the pipeline supplies ``vertex_batch_fn`` it receives the whole
    stream at once (dense, gather-free formulations — e.g. the terrain's
    regular grid); otherwise ``vertex_fn`` is vmapped per vertex. A
    batch function may return a :class:`raster_common.PlanarTris`
    instead of interleaved (clip, vary) — the planar end-to-end path
    (returned as ``(planar, None)``; the rasterizer consumes it with no
    relayouts).
    """
    if draw_instances is None:
        draw_instances = jnp.zeros_like(vertex_index)
    if vertex_batch_fn is not None:
        ctx = BatchVertexCtx(vertex_index, attrs, worlds, iids, bindings,
                             draw_instances)
        out = vertex_batch_fn(ctx)
        from .raster_common import PlanarTris
        if isinstance(out, PlanarTris):
            return out, None
        clip, vary = out
        return (jnp.asarray(clip, jnp.float32),
                jnp.asarray(vary, jnp.float32))

    def one(vi, attr_row, iid, di):
        ctx = VertexCtx(vi, attr_row, worlds[iid], iid, bindings, di)
        clip, vary = vertex_fn(ctx)
        return (jnp.asarray(clip, jnp.float32),
                jnp.asarray(vary, jnp.float32))

    return jax.vmap(one)(vertex_index, attrs, iids, draw_instances)
