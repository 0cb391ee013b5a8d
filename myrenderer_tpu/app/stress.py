"""Stretch-config scene (BASELINE.json config[4]): 4K framebuffer,
~1M-triangle terrain, and 10k instances in one draw.

The 10k instances are one instanced draw (``instance_count``,
``VertexBuffer.zig:7`` generalized): a small billboard quad whose
vertex function places each draw-instance on a grid with a height read
from the terrain's heightmap — 10k drawables, ONE entry in the frame
program.

Run:  python -m myrenderer_tpu.app.stress --size 3840x2160 --frames 8
"""

from __future__ import annotations

import argparse
import math
import time
import jax.numpy as jnp
import numpy as np

from .. import math3d
from ..content import Terrain
from ..renderer import (Binding, BindingLayout, Core, Draw, Instance,
                        Pipeline, Renderer, Surface, VertexBuffer)
from ..renderer.pipeline import BUILTIN_TRANSFORM, MANAGED_STORAGE
from .assets import default_heightmap


def _instanced_marker_pipeline(rend, grid: int, terrain_size: int):
    """10k tiny pyramid markers, one per grid cell, y from the heightmap
    storage binding; placed purely from ctx.draw_instance."""
    spacing = 0.2 * terrain_size / grid

    def vertex_fn(ctx):
        di = ctx.draw_instance
        gx = (di % grid).astype(jnp.float32)
        gz = (di // grid).astype(jnp.float32)
        # world-space cell center over the terrain footprint
        x = (gx + 0.5) * spacing - 0.1 * terrain_size
        z = (gz + 0.5) * spacing - 0.1 * terrain_size
        # sample terrain height at the cell center (fused single-element
        # gather; see VertexCtx.binding_at)
        cell = (jnp.clip((gz * terrain_size / grid).astype(jnp.int32), 0,
                         terrain_size - 1) * terrain_size
                + jnp.clip((gx * terrain_size / grid).astype(jnp.int32),
                           0, terrain_size - 1))
        y = 5.0 * ctx.binding_at(0, cell)

        vi = ctx.vertex_index % 3
        s = spacing * 0.3
        # a small CW triangle standing on the terrain
        ox = jnp.where(vi == 0, 0.0, jnp.where(vi == 1, s, -s))
        oy = jnp.where(vi == 0, s * 2.0, 0.0)
        pos = jnp.stack([x + ox, y + oy, z, jnp.float32(1.0)])
        clip = ctx.world @ pos
        color = jnp.stack([jnp.float32(1.0), jnp.float32(0.4),
                           jnp.float32(0.2), jnp.float32(1.0)])
        return clip, color

    return Pipeline.create(
        rend, vertex_fn=vertex_fn,
        bindings=[BindingLayout(0, MANAGED_STORAGE),
                  BindingLayout(1, BUILTIN_TRANSFORM)],
        cull_mode="none")


class StressApp:
    def __init__(self, width: int = 3840, height: int = 2160,
                 terrain_size: int = 708, instances: int = 10000,
                 backend: str = "auto", raster=None):
        self.core = Core(fixed_timestep=1.0 / 60.0)
        self.window = self.core.create_window(width, height, "stress")
        self.renderer = Renderer(self.core, raster_backend=backend)
        self.renderer.adopt_window(self.window)
        # raster config: explicit --raster override, else the
        # resolution/occupancy-adaptive defaults — at 8 px/tri this
        # workload selects the megatriangle branch of
        # ops.raster_pallas.auto_config (t8 c64 w128 sf1.6), exactly
        # the measured-best hand-pinned config it replaces (round-3/4
        # sweeps; rationale in the auto_config docstring)
        if raster is not None:
            self.renderer.raster_cfg = raster

        hm = default_heightmap(terrain_size)
        terrain_mod = Terrain(self.renderer)
        self.terrain = terrain_mod.create_terrain(hm)
        self.triangles = terrain_size * terrain_size * 2 + instances

        # 10k markers in ONE instanced draw
        grid = int(math.sqrt(instances))
        assert grid * grid == instances, "instances must be a square"
        pipe = _instanced_marker_pipeline(self.renderer, grid,
                                          terrain_size)
        heights = (1.0 - hm.astype(np.float32) / 65535.0).reshape(-1)
        vb = VertexBuffer.new(self.renderer, 0, 1)   # 3 verts, no buffer
        vb.instance_count = instances
        bound = 0.1 * terrain_size
        markers = Instance.create_node(
            self.renderer, pipeline=pipe,
            bindings=[Binding(0, size=heights.size * 4)],
            bounding_box_p0=(-bound, 0.0, -bound),
            bounding_box_p1=(bound, 6.0, bound))
        markers.get_backing().update_buffer(0, heights)
        markers.get_backing().set_vertex_buffer(vb)

        self.terrain.add_child(markers)   # share the camera transform
        self.surface = Surface.create_window_scene(
            self.renderer, self.window, self.terrain)
        far = max(200.0, 0.6 * terrain_size)
        self.surface.set_perspective(math3d.perspective(90, 1.0, 0.1, far))
        self.draw = Draw.create(self.renderer)
        self._bound = 0.1 * terrain_size

    def tick(self):
        t = self.renderer.elapsed_time
        r = 1.1 * self._bound
        cam = (r * math.cos(t), 0.9 * self._bound + 6.0, r * math.sin(t))
        self.terrain.set_xform(
            math3d.look_at(cam, (0.0, 0.0, 0.0), (0.0, 1.0, 0.0)))
        self.draw.begin()
        self.draw.clear((0.259, 0.141, 0.271, 1.0))
        self.draw.draw_surface(self.surface)
        fb = self.draw.end()
        self.renderer.update()
        return fb


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="3840x2160")
    ap.add_argument("--terrain", type=int, default=708)
    ap.add_argument("--instances", type=int, default=10000)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--out", default=None)
    ap.add_argument("--backend", default="auto")
    from ..ops.raster_pallas import RASTER_FLAG_HELP, config_from_flag
    ap.add_argument("--raster", default=None, help=RASTER_FLAG_HELP)
    args = ap.parse_args(argv)

    raster = config_from_flag(args.raster) if args.raster else None

    import jax
    w, h = (int(v) for v in args.size.split("x"))
    app = StressApp(width=w, height=h, terrain_size=args.terrain,
                    instances=args.instances, backend=args.backend,
                    raster=raster)
    print(f"triangles/frame: {app.triangles}", flush=True)
    t0 = time.perf_counter()
    app.tick()
    jax.block_until_ready(app.window.framebuffer)
    print(f"first frame (compile): {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(args.frames):
        app.tick()
    jax.block_until_ready(app.window.framebuffer)
    dt = (time.perf_counter() - t0) / args.frames
    # capacity overflow must not masquerade as a perf win (ADVICE r3):
    # a frame that exceeded the stream/big capacities silently dropped
    # triangles while reporting a faster ms/frame, so surface the flag
    # from the LAST timed frame next to the headline number.
    import numpy as np
    ovf = np.asarray(app.draw.last_overflow)
    print(f"{args.frames} frames: {dt * 1000:.1f} ms/frame "
          f"({1 / dt:.2f} fps, "
          f"{app.triangles / dt / 1e6:.1f} Mtri/s) "
          f"overflow={ovf.tolist()}", flush=True)
    if ovf.any():
        raise SystemExit("OVERFLOW during timed loop — capacity config "
                         "invalid, timing not comparable")
    if args.out:
        from ..utils.png import save_rgba8
        save_rgba8(args.out, app.window.read_pixels())
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
