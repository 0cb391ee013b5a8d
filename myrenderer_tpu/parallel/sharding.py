"""Multi-chip rendering: spatial framebuffer sharding over a device mesh.

The reference is strictly single-device (SURVEY.md §2.3); this module is
the TPU-native scale-out path (§5.8): the framebuffer is sharded by
pixel rows across the mesh's 'rows' axis, the vertex stage is sharded
over triangles across the 'tris' axis, and the only collective is an
``all_gather`` of post-transform triangles onto every row shard
(rasterization is embarrassingly parallel over pixels: each tile is
owned by exactly one chip — no reduction needed; the image never needs
to be gathered unless the host asks for it).

Works identically on a real TPU pod slice or on N virtual CPU devices
(``--xla_force_host_platform_device_count``), which is how the tests
and the driver's ``dryrun_multichip`` exercise it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import raster_common as rc


def make_mesh(n_devices: int | None = None, rows: int | None = None,
              tris: int | None = None) -> Mesh:
    """2D mesh ('rows', 'tris'). Defaults: all devices on 'rows' (pure
    spatial parallelism), tris=1."""
    devices = jax.devices()
    n = n_devices or len(devices)
    rows = rows or n
    tris = tris or (n // rows)
    if rows * tris != n:
        raise ValueError(f"mesh {rows}x{tris} != {n} devices")
    dev = np.array(devices[:n]).reshape(rows, tris)
    return Mesh(dev, ("rows", "tris"))


def sharded_render_step(mesh: Mesh, height: int, width: int,
                        fragment_fn=None, return_winner: bool = False,
                        clip_capacity: int = 16, raster_cfg=None):
    """Build a jitted multi-chip render step.

    step(tri_clip [T,3,4], tri_vary [T,3,C], valid [T], fb [H,W,4])
      -> fb [H,W,4]   (or (fb, winner i32[H,W]) with ``return_winner``)

    Sharding: fb rows over 'rows'; the vertex-stage outputs arrive
    sharded over 'tris' and are all-gathered (ICI) inside; each row
    shard rasterizes its horizontal band of the frame against the full
    triangle set with a local depth buffer. ``return_winner`` also
    returns the per-pixel winning triangle index (-1 = uncovered), the
    exact-comparison surface for parity tests: winner decisions are
    deterministic where shaded RGBA can flip by 1 ulp on edges.

    ``raster_cfg`` (a ``raster_pallas.RasterConfig``) selects the tiled
    Pallas kernel per band (the TPU hot path, band output bit-identical
    to a full-frame kernel render); None keeps the simple per-triangle
    oracle loop (runs anywhere, no tiling constraints).
    """
    fragment_fn = fragment_fn or (lambda c: c)
    n_rows = mesh.shape["rows"]
    if height % n_rows:
        raise ValueError(f"height {height} not divisible by mesh rows "
                         f"{n_rows}")
    band = height // n_rows

    fb_spec = P("rows", None, None)
    tri_spec = P("tris")

    # check_vma=False: after the 'tris' all-gather every tris-shard
    # computes identical band pixels, so the output is replicated over
    # 'tris' in fact, which the static vma analysis cannot prove.
    win_spec = P("rows", None)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(tri_spec, tri_spec, tri_spec, fb_spec),
             out_specs=(fb_spec, win_spec), check_vma=False)
    def step(tri_clip, tri_vary, valid, fb_band):
        # gather the full triangle set onto every shard (ICI all-gather
        # along 'tris'; no-op when tris=1)
        tri_clip = jax.lax.all_gather(tri_clip, "tris", tiled=True)
        tri_vary = jax.lax.all_gather(tri_vary, "tris", tiled=True)
        valid = jax.lax.all_gather(valid, "tris", tiled=True)

        # eye-plane clipping on the gathered (replicated) set: every
        # shard derives the identical clipped stream. Capacity overflow
        # is not surfaced here (static cap; raise clip_capacity).
        tri_clip, tri_vary, valid, _zb, _cc, _ovf = rc.clip_near_capacity(
            tri_clip, tri_vary, valid, clip_capacity)

        row = jax.lax.axis_index("rows")
        y0 = row * band
        # rasterize this band: pixel grid offset by the band origin
        tc = rc.triangle_setup(tri_clip, tri_vary, valid, width, height)
        axes = ("rows", "tris")
        depth0 = jax.lax.pcast(jnp.full((band, width), 1.0, jnp.float32),
                               axes, to="varying")

        if raster_cfg is not None:
            # tiled Pallas kernel over this shard's band (bit-identical
            # to the same rows of a full-frame kernel render)
            from ..ops import raster_pallas
            depth, winner, num, den, _ovf = raster_pallas.rasterize(
                tc, band, width, depth=depth0, tri_clip=tri_clip,
                cfg=raster_cfg, y0=y0, vp_height=height)
            rgba = fragment_fn(jnp.moveaxis(num, 0, -1) / den[..., None])
            return (jnp.where((winner >= 0)[..., None], rgba, fb_band),
                    winner)

        px, py = rc.pixel_grids(band, width, y0=y0)
        # mark the loop carries as device-varying (shard_map's vma check)
        winner = jax.lax.pcast(jnp.full((band, width), -1, jnp.int32),
                               axes, to="varying")
        packed = rc.pack_coeffs(tc)

        def body(t, carry):
            d, w = carry
            rowc = tuple(packed[t, i] for i in range(rc.COEFF_LANES))
            cov, z = rc.coverage_depth(rowc, px, py)
            return rc.depth_test_update(cov, z, d, w, t)

        depth, winner = jax.lax.fori_loop(0, packed.shape[0], body,
                                          (depth0, winner))
        varp, covered = rc.resolve_varyings(tc, jnp.maximum(winner, 0),
                                            px, py)
        rgba = fragment_fn(varp)
        return jnp.where((winner >= 0)[..., None], rgba, fb_band), winner

    fb_sharding = NamedSharding(mesh, fb_spec)
    tri_sharding = NamedSharding(mesh, tri_spec)

    @jax.jit
    def render(tri_clip, tri_vary, valid, fb):
        tri_clip = jax.lax.with_sharding_constraint(tri_clip, tri_sharding)
        fb = jax.lax.with_sharding_constraint(fb, fb_sharding)
        out, winner = step(tri_clip, tri_vary, valid, fb)
        return (out, winner) if return_winner else out

    return render
