"""The demo application: terrain + two polygons + orbiting camera.

One-to-one rebuild of ``App/App.zig``: a window
("Platypro's Thing", 1280x720, :40), a 3D terrain surface under
``perspective(90, 1.0, 0.1, 200)`` (:64-66), two polygons (a concave
heptagon and a square, :68-83) under a shared 2D root with
``projection2D(0..200 x 200..0, 0.1..200)`` (:85-89), and a per-frame
orbit camera — ``cam = (10 cos t, 6, 10 sin t)`` looking at the origin
(:98-104) applied as the *terrain root node's* transform, composing with
the surface projection at render time.

Frame sequence (:105-111): begin, clear(0.259, 0.141, 0.271), draw
surface3d, draw surface2d, end, renderer.update().

Run:  python -m myrenderer_tpu.app.demo --size 256x256 --frames 1 \
          --out /tmp/frame.png
"""

from __future__ import annotations

import argparse
import math
import time
from dataclasses import dataclass
from typing import Optional

import numpy as np

from .. import math3d
from ..content import Polygon, Terrain
from ..renderer import Core, Draw, Renderer, SceneNode, Surface
from .assets import default_heightmap

CLEAR_COLOR = (0.259, 0.141, 0.271, 1.0)

POLYGON1 = [  # App.zig:68-76 (concave heptagon)
    (62.742857, 106.97143), (93.085712, 65.828571), (147.08571, 85.628572),
    (122.14285, 144.77143), (102.34286, 93.857142), (79.199998, 130.37143),
    (81.00000, 105.17143),
]
POLYGON2 = [  # App.zig:78-83 (square)
    (10.0, 10.0), (40.0, 10.0), (40.0, 40.0), (10.0, 40.0),
]


@dataclass
class DemoApp:
    """The full App.zig scene, reusable from tests and the benchmark."""

    width: int = 1280
    height: int = 720
    heightmap: Optional[object] = None      # path, array, or None=generated
    backend: str = "auto"
    fixed_timestep: Optional[float] = 1.0 / 60.0
    mesh: Optional[object] = None           # multi-chip row-shard mesh
    raster: Optional[object] = None         # RasterConfig override

    def __post_init__(self):
        self.core = Core(fixed_timestep=self.fixed_timestep)
        self.window = self.core.create_window(self.width, self.height,
                                              "Platypro's Thing")
        self.renderer = Renderer(self.core, raster_backend=self.backend,
                                 mesh=self.mesh)
        if self.raster is not None:
            self.renderer.raster_cfg = self.raster
        # else: resolution/occupancy-adaptive defaults
        # (ops.raster_pallas.auto_config) — at 1080p they resolve to
        # the measured-best t16c32w128 of round-4 batches 10-13, and
        # unlike a hand-pinned config they scale the tile with the
        # frame (8K: t16 86 -> t32 43 ms, round-5 batch 15)
        # scene construction is DEFERRED to the window_open event, the
        # reference's lifecycle (App.zig:54-92 builds the scene inside
        # the event branch of the first tick). create_window enqueued
        # it; drain synchronously here so the scene exists before the
        # first tick (headless Core has no OS latency to wait out).
        while (ev := self.core.next_event()) is not None:
            if ev.kind == "window_open":
                self._on_window_open(ev.window)

    def _on_window_open(self, window):
        """The App.zig:54-92 event branch: adopt the window, build the
        terrain + polygon scene and the two surfaces."""
        self.renderer.adopt_window(window)

        terrain_mod = Terrain(self.renderer)
        polygon_mod = Polygon(self.renderer)

        hm = self.heightmap if self.heightmap is not None \
            else default_heightmap()
        self.terrain = terrain_mod.create_terrain(hm)
        self.surface3d = Surface.create_window_scene(
            self.renderer, self.window, self.terrain)
        self.surface3d.set_perspective(
            math3d.perspective(90, 1.0, 0.1, 200))

        self.polygon1 = polygon_mod.create_polygon(POLYGON1)
        self.polygon2 = polygon_mod.create_polygon(POLYGON2)
        self.base_2d_node = SceneNode.create(self.renderer)
        self.base_2d_node.add_child(self.polygon1.get_node())
        self.base_2d_node.add_child(self.polygon2.get_node())
        self.surface2d = Surface.create_window_scene(
            self.renderer, self.window, self.base_2d_node)
        self.surface2d.set_perspective(math3d.projection_2d(
            left=0.0, right=200.0, bottom=200.0, top=0.0,
            near=0.1, far=200.0))

        self.draw = Draw.create(self.renderer)
        self.terrain_mod = terrain_mod
        self.polygon_mod = polygon_mod

    def tick(self):
        """One frame (App.zig:97-112)."""
        rend = self.renderer
        t = rend.elapsed_time
        cam = (10.0 * math.cos(t), 6.0, 10.0 * math.sin(t))
        self.terrain.set_xform(
            math3d.look_at(cam, (0.0, 0.0, 0.0), (0.0, 1.0, 0.0)))
        self.draw.begin()
        self.draw.clear(CLEAR_COLOR)
        self.draw.draw_surface(self.surface3d)
        self.draw.draw_surface(self.surface2d)
        fb = self.draw.end()
        rend.update()
        return fb

    def run(self, frames: int) -> np.ndarray:
        fb = None
        for _ in range(frames):
            fb = self.tick()
        return np.asarray(fb)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--size", default="1280x720",
                    help="WxH (default 1280x720, the reference's window)")
    ap.add_argument("--frames", type=int, default=1)
    ap.add_argument("--out", default=None, help="write last frame PNG")
    ap.add_argument("--heightmap", default=None,
                    help="16-bit grayscale PNG (default: generated)")
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "oracle", "pallas"])
    ap.add_argument("--time", action="store_true",
                    help="print steady-state ms/frame")
    ap.add_argument("--dump-dir", default=None,
                    help="write every frame as frame_%%04d.png")
    ap.add_argument("--gif", default=None,
                    help="write all --frames frames as one animated GIF"
                         " — the headless stand-in for the reference's"
                         " animated window (App.zig:40,52)")
    from ..ops.raster_pallas import RASTER_FLAG_HELP, config_from_flag
    ap.add_argument("--raster", default=None, help=RASTER_FLAG_HELP)
    args = ap.parse_args(argv)

    raster = config_from_flag(args.raster) if args.raster else None
    w, h = (int(v) for v in args.size.split("x"))
    app = DemoApp(width=w, height=h, heightmap=args.heightmap,
                  backend=args.backend, raster=raster)

    if args.dump_dir:
        import os

        from ..utils.png import save_rgba8
        os.makedirs(args.dump_dir, exist_ok=True)
        for i in range(args.frames):
            app.tick()
            save_rgba8(os.path.join(args.dump_dir, f"frame_{i:04d}.png"),
                       app.window.read_pixels())
        print(f"wrote {args.frames} frames to {args.dump_dir}")
        return

    if args.gif:
        from PIL import Image
        imgs = []
        for _ in range(args.frames):
            app.tick()
            imgs.append(Image.fromarray(
                app.window.read_pixels(), "RGBA").convert("RGB"))
        # replay at the app's fixed step (GIF durations are in ms and
        # most decoders clamp below ~20 ms)
        dur = max(20, round((app.fixed_timestep or 1 / 60) * 1000))
        imgs[0].save(args.gif, save_all=True, append_images=imgs[1:],
                     duration=dur, loop=0)
        print(f"wrote {args.gif} ({args.frames} frames)")
        return

    app.tick()  # warmup/compile
    if args.time and args.frames > 1:
        import jax
        jax.block_until_ready(app.window.framebuffer)
        t0 = time.perf_counter()
        n = args.frames - 1
        for _ in range(n):
            app.tick()
        # fence on the device only: fetching pixels would time the
        # host<->device transfer, not rendering
        jax.block_until_ready(app.window.framebuffer)
        dt = time.perf_counter() - t0
        # capacity overflow must not masquerade as a perf win when
        # sweeping --raster configs (same guard as app.stress)
        import numpy as np
        ovf = np.asarray(app.draw.last_overflow)
        print(f"{n} frames: {dt * 1000 / n:.3f} ms/frame "
              f"({n / dt:.1f} fps) overflow={ovf.tolist()}")
    elif args.frames > 1:
        for _ in range(args.frames - 1):
            app.tick()

    if args.out:
        from ..utils.png import save_rgba8
        save_rgba8(args.out, app.window.read_pixels())
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
