"""Renderer core: frame clock, object registries, window adoption.

Mirrors ``Renderer/Renderer.zig`` (module state + pools, :21-34) and the
slice of ``mach.Core`` the reference actually uses (window size/format +
frame timing, SURVEY.md §1 L2). There is no OS window: a Window here is a
headless render target — an HBM-resident RGBA framebuffer — which is all
the reference's swap chain was to the renderer (a color attachment,
``Surface.zig:144-145``).
"""

from __future__ import annotations

import time
from typing import Optional

import jax.numpy as jnp
import numpy as np


class Window:
    """Headless render target (swap-chain analogue).

    Owns the color framebuffer: f32[H, W, 4] RGBA in HBM. ``read_pixels``
    quantizes to uint8 the way a bgra8unorm swap chain would.
    """

    _next_id = 0

    def __init__(self, width: int, height: int, title: str = ""):
        self.id = Window._next_id
        Window._next_id += 1
        self.width = int(width)
        self.height = int(height)
        self.title = title
        self.framebuffer = jnp.zeros((self.height, self.width, 4),
                                     jnp.float32)

    @property
    def framebuffer_size(self) -> tuple[int, int]:
        return (self.width, self.height)

    def resize(self, width: int, height: int) -> None:
        """Resize the render target, reallocating the framebuffer (the
        swap-chain recreate analogue)."""
        if (int(width), int(height)) == (self.width, self.height):
            return
        self.width, self.height = int(width), int(height)
        self.framebuffer = jnp.zeros((self.height, self.width, 4),
                                     jnp.float32)

    def read_pixels(self, as_uint8: bool = True) -> np.ndarray:
        fb = np.asarray(self.framebuffer)
        if not as_uint8:
            return fb
        return np.clip(np.rint(fb * 255.0), 0, 255).astype(np.uint8)


class Event:
    """A ``mach.Core`` event (the union the reference drains per tick,
    ``App/App.zig:52``). Kinds used by the reference: ``window_open``
    (scene construction is deferred to it, ``App.zig:54-92``),
    ``close`` (exit, ``App.zig:93-95``); ``framebuffer_resize`` is
    emitted on :meth:`Core.resize_window` for the Surface rebuild path
    (``Surface.zig:76-94``)."""

    __slots__ = ("kind", "window")

    def __init__(self, kind: str, window: Optional["Window"] = None):
        self.kind = kind
        self.window = window

    def __repr__(self):
        wid = None if self.window is None else self.window.id
        return f"Event({self.kind!r}, window={wid})"


class Core:
    """Frame-loop driver (the used slice of ``mach.Core``): creates
    windows, feeds the renderer's clock (``Renderer.zig:42-43``), and
    drives the event-queue lifecycle the reference's app loop drains
    (``nextEvent()``, ``App.zig:52``): ``create_window`` enqueues
    ``window_open``, so applications can defer scene construction to
    the event exactly like ``App.zig:54-92``.

    ``fixed_timestep`` makes frames deterministic (tests, goldens);
    ``None`` uses wall-clock deltas (interactive/bench).
    """

    def __init__(self, fixed_timestep: Optional[float] = None):
        self.windows: list[Window] = []
        self.fixed_timestep = fixed_timestep
        self._last_time = time.perf_counter()
        self._events: list[Event] = []
        self.should_close = False

    def create_window(self, width: int, height: int, title: str = "") -> Window:
        w = Window(width, height, title)
        self.windows.append(w)
        self.push_event(Event("window_open", w))
        return w

    def resize_window(self, window: Window, width: int,
                      height: int) -> None:
        """Resize + emit ``framebuffer_resize`` (drives the Surface
        depth-texture rebuild path, ``Surface.zig:76-94``)."""
        window.resize(width, height)
        self.push_event(Event("framebuffer_resize", window))

    def request_close(self, window: Optional[Window] = None) -> None:
        """Enqueue a ``close`` event (``App.zig:93-95`` exits on it)."""
        self.push_event(Event("close", window))

    def push_event(self, event: Event) -> None:
        self._events.append(event)

    def next_event(self) -> Optional[Event]:
        """Pop the oldest pending event (``core.nextEvent()`` loop
        shape); ``close`` also latches :attr:`should_close`."""
        if not self._events:
            return None
        ev = self._events.pop(0)
        if ev.kind == "close":
            self.should_close = True
        return ev

    def next_delta_time(self) -> float:
        if self.fixed_timestep is not None:
            return self.fixed_timestep
        now = time.perf_counter()
        dt = now - self._last_time
        self._last_time = now
        return dt


class Renderer:
    """Top-level renderer module state (``Renderer/Renderer.zig:21-34``):
    frame clock, uniform ring-slot counter, adopted window, and the object
    registries for pipelines / instances / surfaces / scene nodes / draws.

    ``current_buffer_slot`` cycles mod MAX_COPIES=4 (``Instance.zig:53``)
    for API parity; with a functional frame step there is no CPU/GPU
    buffer race to multi-buffer against, so it carries no semantics here.
    """

    MAX_COPIES = 4

    def __init__(self, core: Optional[Core] = None,
                 raster_backend: str = "auto", mesh=None):
        self.core = core or Core(fixed_timestep=1.0 / 60.0)
        # multi-chip: a jax.sharding.Mesh with a 'rows' axis. The frame
        # program rasterizes each horizontal framebuffer band on its own
        # device (SURVEY.md §5.8 scale-out; the reference is
        # single-device). Requires the pallas backend.
        self.mesh = mesh
        self.delta_time = 0.0
        self.elapsed_time = 0.0
        self.frame_counter = 1
        self.current_buffer_slot = 0

        self.window: Optional[Window] = None

        self.pipelines: list = []
        self.instances: list = []
        self.surfaces: list = []
        self.scene_nodes: list = []
        self.draws: list = []

        # bumped on any structural scene change -> frame program rebuild
        self.scene_version = 0
        # bumped when any node's AABB changes -> cull-input re-upload
        self.bounds_version = 0

        # 'oracle' (full-frame jnp), 'pallas' (tiled kernel), or 'auto'
        # (pallas on TPU, oracle elsewhere)
        self.raster_backend = raster_backend

        # optional explicit RasterConfig; None (default) selects
        # resolution/occupancy-adaptive tiling per frame plan
        # (ops.raster_pallas.auto_config) — the reference rasterizes
        # at any window size with no knob (Surface.zig:76-94)
        self.raster_cfg = None

        # observability (SURVEY.md §5.5): when True, Draw.end fills
        # frame_stats with per-frame counters (no device sync)
        self.collect_stats = False
        self.frame_stats: dict = {}

        # When True, the frame program also returns each raster pass's
        # per-pixel winning-triangle buffer (Draw.last_winners) — the
        # exact decision surface for parity tests (winner indices are
        # deterministic where shaded RGBA can flip by 1 ulp on edges).
        self.debug_winner = False

        # Opt-in: compile the NEXT capacity-ladder step (big_scale x4)
        # in a background thread after each plan build, so an overflow
        # bump re-renders against a warm compilation cache instead of
        # stalling for a full XLA compile (Draw._maybe_warm_next_capacity).
        self.precompile_capacity_bump = False

        # When True, Draw.end checks every frame's capacity-overflow
        # flag synchronously before publishing and re-renders flagged
        # frames with bumped capacity: NO published frame ever drops
        # triangles, at the cost of one device->host sync per frame
        # (microseconds on local hardware). Default False: the flag is
        # polled asynchronously and a steady-state overflow can drop
        # triangles in up to Draw.OVERFLOW_WINDOW (8) published frames
        # before the bump lands (frame_stats['overflow_risk_frames']
        # reports the live value).
        self.strict_overflow = False

    # -- lifecycle (Renderer.zig:36-56) ------------------------------------

    def adopt_window(self, window: Window) -> None:
        """Bind the renderer to a window's framebuffer (the analogue of
        grabbing device/queue/format at ``Renderer.zig:46-50``)."""
        self.window = window

    def update(self) -> None:
        """Advance the frame clock (``Renderer.zig:52-56``)."""
        self.current_buffer_slot = (self.current_buffer_slot + 1) % self.MAX_COPIES
        self.frame_counter += 1
        self.delta_time = self.core.next_delta_time()
        self.elapsed_time += self.delta_time

    def bump_scene_version(self) -> None:
        self.scene_version += 1
        self.bounds_version += 1

    def bump_bounds_version(self) -> None:
        self.bounds_version += 1

    # -- registry helpers ---------------------------------------------------

    def _register(self, pool: list, obj) -> int:
        pool.append(obj)
        self.bump_scene_version()
        return len(pool) - 1
