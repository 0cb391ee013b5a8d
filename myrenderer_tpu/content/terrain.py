"""Terrain module: heightmap PNG -> procedural terrain mesh.

Capability match for ``Terrain/Terrain.zig``: the mesh has NO vertex
buffer — the vertex function synthesizes 6 vertices per heightmap quad
from ``vertex_index`` alone (``Terrain.zig:21-50``), reading heights from
a storage binding. On TPU this is a naturally vectorized index
computation under ``vmap``; the 60k-vertex demo terrain is one fused
gather + FMA chain inside the jitted frame.

Shader-for-shader correspondence (``Terrain.zig:21-78``):
  vertex_at  = vi % 6 ; quad_at = vi / 6
  corner     = quad_vals[vertex_at]             (two CCW-in-xz tris/quad)
  xz         = 0.2 * (corner + (quad/size, quad%size)) - 0.1 * size
  height     = heightmap[quad_lookup[vertex_at]]
  out.pos    = world_xform @ data.xform @ (xz.x, 5*height, xz.y, 1)
  out.color  = (5h, 5h, 5h, 1)                  (grayscale by height)

Bindings (``Terrain.zig:131-151``): 0 = managed uniform {mat4 xform,
size}, 1 = managed read-only storage heightmap (flat f32[size*size]),
2 = builtin transform.

Quirk reproduced as *intent* (SURVEY.md §2.5 spirit): the reference's
quad_lookup indexes up to ``quad + size + 1`` which exceeds the buffer
for the last row/column of quads; WebGPU's robust buffer access clamps.
We clamp explicitly (``jnp.clip``).

Height decode matches ``Terrain.zig:120``: h = 1 - gray16/65535.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import raster_common as rc
from ..renderer import (Binding, BindingLayout, Instance, Pipeline,
                        SceneNode, VertexBuffer)
from ..renderer.pipeline import (BUILTIN_TRANSFORM, MANAGED_STORAGE,
                                 MANAGED_UNIFORM)
from ..utils.png import load_grayscale16

# (x, z) corner offsets for the 6 vertices of a quad (Terrain.zig:28-35)
_QUAD_VALS = np.array([[1.0, 0.0], [0.0, 0.0], [1.0, 1.0],
                       [1.0, 1.0], [0.0, 0.0], [0.0, 1.0]], np.float32)
# heightmap index offsets per corner, in units of (size, 1)
# (Terrain.zig:38-45): [quad+size, quad, quad+size+1, quad+size+1, quad,
# quad+1]
_LOOKUP_ROW = np.array([1, 0, 1, 1, 0, 0], np.int32)   # multiples of size
_LOOKUP_COL = np.array([0, 0, 1, 1, 0, 1], np.int32)   # +1 offsets


def _make_vertex_fn(size: int):
    quad_vals = jnp.asarray(_QUAD_VALS)
    lookup_row = jnp.asarray(_LOOKUP_ROW)
    lookup_col = jnp.asarray(_LOOKUP_COL)
    fsize = jnp.float32(size)
    max_idx = size * size - 1

    def vertex_fn(ctx):
        vi = ctx.vertex_index
        vertex_at = vi % 6
        quad_at = vi // 6
        quad_coords = jnp.stack([
            (quad_at // size).astype(jnp.float32),
            (quad_at % size).astype(jnp.float32)])
        corner = quad_vals[vertex_at]
        xz = 0.2 * (corner + quad_coords) - 0.1 * fsize

        lookup = quad_at + lookup_row[vertex_at] * size + lookup_col[vertex_at]
        heightmap = ctx.binding(1)                      # f32[size*size]
        h = heightmap[jnp.clip(lookup, 0, max_idx)]

        uniform = ctx.binding(0)                        # f32[17]
        data_xform = uniform[:16].reshape(4, 4)
        y = 5.0 * h
        pos = jnp.stack([xz[0], y, xz[1], jnp.float32(1.0)])
        clip = ctx.world @ (data_xform @ pos)
        color = jnp.stack([y, y, y, jnp.float32(1.0)])
        return clip, color

    return vertex_fn


def _make_vertex_batch_fn(size: int):
    """Dense whole-stream formulation of the terrain vertex shader (the
    performance path; numerically equivalent to ``_make_vertex_fn`` up
    to FMA/association rounding). Assumes full-range draws (the terrain
    always draws vertices [0, size*size*6), ``Terrain.zig:126``).

    The terrain is a regular grid, so per-vertex heightmap gathers
    become four *shifted views* of the flat height array — zero gathers,
    pure slices and broadcast arithmetic. The flat-index clamp
    (robust-buffer-access semantics of the reference's out-of-bounds
    ``quad + size + 1`` lookups, ``Terrain.zig:38-45``) is reproduced by
    extending the flat array with copies of its last element.

    Emits :class:`raster_common.PlanarTris` — flat per-slot FMA chains
    assembled by ONE contiguous concatenate + free reshape, zero
    interleave relayouts. The trick making this possible: triangles go
    out in [all first-half-quad tris ++ all second-half-quad tris]
    array order (per instance) instead of submission order, so each
    planar (corner, channel) plane is a 2-piece concat of contiguous
    [s2] slot vectors rather than a 2-way interleave (a straight
    submission-order planar formulation was built first and measured
    NET-NEGATIVE: its 24 interleave stacks lower to T(2,128)-tiled
    slice copies, ~1.2 ms each at the 1M-tri stretch). Depth
    resolution is order-free (lowest-ID depth-tie break), so
    ``PlanarTris.ids`` carries the submission ranks (2q, 2q+1 per quad
    q — the ``Terrain.zig:126`` triangle order) and winner indices /
    tie semantics are exactly those of submission order.
    """
    s2 = size * size
    fsize = jnp.float32(size)

    def vertex_batch_fn(ctx):
        n_inst = ctx.worlds.shape[0]

        quad = jnp.arange(s2, dtype=jnp.int32)
        qx = (quad // size).astype(jnp.float32)              # [s2]
        qz = (quad % size).astype(jnp.float32)
        # per-slot positions, flat [s2] (corner offsets are the static
        # scalars of _QUAD_VALS row s)
        xs = [0.2 * (float(_QUAD_VALS[s, 0]) + qx) - 0.1 * fsize
              for s in range(6)]
        zs = [0.2 * (float(_QUAD_VALS[s, 1]) + qz) - 0.1 * fsize
              for s in range(6)]
        ones = jnp.ones(s2, jnp.float32)

        per_slot_clip = []   # [instance][slot][channel] -> [s2]
        per_slot_y = []      # [instance][slot] -> [s2]
        ids_parts = []
        for i in range(n_inst):
            hm = ctx.binding(1)[0 if n_inst == 1 else i]
            uniform = ctx.binding(0)[0 if n_inst == 1 else i]
            world = ctx.worlds[0 if n_inst == 1 else i]
            # flat-clamped shifted views: index q + d reads
            # hm_ext[q + d] where hm_ext pads with the last element
            hm_ext = jnp.concatenate(
                [hm, jnp.broadcast_to(hm[-1:], (size + 1,))])
            c_q = hm_ext[0:s2]          # offset 0
            c_qs = hm_ext[size:s2 + size]      # offset +size
            c_qs1 = hm_ext[size + 1:s2 + size + 1]  # offset +size+1
            c_q1 = hm_ext[1:s2 + 1]     # offset +1
            # per _LOOKUP tables: [q+size, q, q+size+1, q+size+1, q, q+1]
            hs = [c_qs, c_q, c_qs1, c_qs1, c_q, c_q1]
            ys = [5.0 * h for h in hs]
            data_xform = uniform[:16].reshape(4, 4)
            m = world @ data_xform                            # [4, 4]
            # clip channel ch of slot s = the (pos @ m.T) row as flat
            # FMAs over [s2] vectors (w = 1 folds into + m[ch, 3])
            per_slot_clip.append(
                [[m[ch, 0] * xs[s] + m[ch, 1] * ys[s]
                  + m[ch, 2] * zs[s] + m[ch, 3] for ch in range(4)]
                 for s in range(6)])
            per_slot_y.append(ys)
            ids_parts.append(2 * quad + 2 * s2 * i)          # tri0 ranks
            ids_parts.append(2 * quad + 1 + 2 * s2 * i)      # tri1 ranks

        # assemble flat planes: plane (corner k, channel ch) = concat
        # over (instance, tri-half) of contiguous [s2] blocks, where
        # tri0's corner k is slot k and tri1's is slot k + 3. Each
        # plane is a flat [T] vector — PlanarTris carries them as-is
        # (no [3, 4, T] stacking; see the PlanarTris docstring).
        def cat(parts):
            return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

        def clip_plane(k, ch):
            return cat([per_slot_clip[i][k + h][ch]
                        for i in range(n_inst) for h in (0, 3)])

        def vary_plane(k, ch):
            if ch == 3:
                return cat([ones for _ in range(2 * n_inst)])
            return cat([per_slot_y[i][k + h]
                        for i in range(n_inst) for h in (0, 3)])

        clip = tuple(tuple(clip_plane(k, ch) for ch in range(4))
                     for k in range(3))
        vary = tuple(tuple(vary_plane(k, ch) for ch in range(4))
                     for k in range(3))
        ids = cat(ids_parts)
        return rc.PlanarTris(clip, vary, ids)

    return vertex_batch_fn


class Terrain:
    """Terrain content module (``Terrain/Terrain.zig``). One pipeline per
    heightmap size (the vertex function closes over ``size``, which also
    fixes the storage binding's shape)."""

    def __init__(self, renderer):
        self.renderer = renderer
        self._pipelines: dict[int, Pipeline] = {}

    def init(self):  # parity no-op: pipelines are created lazily per size
        return self

    def _pipeline_for(self, size: int) -> Pipeline:
        pipe = self._pipelines.get(size)
        if pipe is None:
            pipe = Pipeline.create(
                self.renderer,
                vertex_fn=_make_vertex_fn(size),
                vertex_batch_fn=_make_vertex_batch_fn(size),
                bindings=[BindingLayout(0, MANAGED_UNIFORM),
                          BindingLayout(1, MANAGED_STORAGE),
                          BindingLayout(2, BUILTIN_TRANSFORM)],
            )
            self._pipelines[size] = pipe
        return pipe

    def create_terrain(self, source) -> SceneNode:
        """Build a terrain node (``Terrain.zig:88-129``).

        ``source``: path to a 16-bit grayscale PNG, or a numpy array —
        uint16 (decoded as 1 - v/65535, ``Terrain.zig:120``) or float32
        heights in [0, 1] used directly.
        """
        if isinstance(source, (str, bytes)):
            gray = load_grayscale16(source)
            heights = (1.0 - gray.astype(np.float32) / 65535.0)
        else:
            arr = np.asarray(source)
            if arr.dtype == np.uint16:
                heights = 1.0 - arr.astype(np.float32) / 65535.0
            else:
                heights = arr.astype(np.float32)
        if heights.ndim != 2 or heights.shape[0] != heights.shape[1]:
            raise ValueError("heightmap must be square")
        size = heights.shape[0]

        pipeline = self._pipeline_for(size)
        bound = 0.1 * size
        node = Instance.create_node(
            self.renderer, pipeline=pipeline,
            bindings=[Binding(0, size=17 * 4),
                      Binding(1, size=size * size * 4)],
            bounding_box_p0=(-bound, 0.0, -bound),
            bounding_box_p1=(bound, 5.0, bound))
        inst = node.get_backing()

        # uniform: {xform: mat4 = ident, size} (Terrain.zig:80-83,127)
        inst.update_buffer(0, np.eye(4, dtype=np.float32).reshape(-1))
        inst.update_buffer(0, np.float32(size), byte_offset=16 * 4)
        # heightmap upload (the reference streams 64-float chunks,
        # Terrain.zig:114-124; one byte-addressed write here)
        inst.update_buffer(1, heights.reshape(-1))

        inst.set_vertex_buffer(VertexBuffer.new(
            self.renderer, 0, size * size * 2))  # size^2 quads * 2 tris
        return node

    def deinit(self):
        for p in self._pipelines.values():
            p.destroy()
        self._pipelines.clear()
