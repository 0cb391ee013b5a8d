#!/usr/bin/env python
"""Per-stage timing of the triangle-sharded pre-kernel pipeline on the
8-device virtual CPU mesh (VERDICT r3 lever 4: evidence that the
'rows'-axis constraints DIVIDE the vertex/setup/pack cost, not just
pass winner parity).

Times jit(setup + pack + bbox) over T random triangles twice:
  - replicated: inputs replicated, no sharding constraints
  - sharded:    inputs sharded over mesh 'rows', outputs pinned sharded
and prints the speedup. On 8 virtual CPU devices the XLA:CPU collective
overhead is real, so the expected ratio is ~3-6x, not 8x — the point is
that it is >> 1 (the constraints bind and the compute partitions).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/shard_stage_timing.py [--t 1000000]
"""

import argparse
import os
import sys
import time

os.environ["PALLAS_AXON_POOL_IPS"] = ""
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

# jax.config, not env vars: this container's sitecustomize
# pre-registers the axon TPU plugin and parses XLA_FLAGS before this
# module runs (same workaround as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from myrenderer_tpu.ops import raster_common as rc  # noqa: E402
from myrenderer_tpu.ops import raster_pallas as rp  # noqa: E402
from myrenderer_tpu.parallel import make_mesh  # noqa: E402


def stage(tri_clip, tri_vary, valid, width, height):
    """The pre-kernel stage under test: triangle setup + full pack +
    viewport bbox (what _setup_batch runs per batch)."""
    tc = rc.triangle_setup(tri_clip, tri_vary, valid, width, height,
                           "back")
    packed = rc.pack_coeffs_full(tc)
    bbox = rp.viewport_bbox(tri_clip, width, height)
    return packed, tc.valid, bbox


def bench(fn, args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=1_000_000)
    args = ap.parse_args()
    T, W, H = args.t, 3840, 2160
    rng = np.random.default_rng(0)
    clip = jnp.asarray(rng.uniform(-1, 1, (T, 3, 4)).astype(np.float32)
                       + np.float32(2.0))
    vary = jnp.asarray(rng.uniform(0, 1, (T, 3, 4)).astype(np.float32))
    valid = jnp.ones(T, bool)

    mesh = make_mesh(8, rows=8, tris=1)
    sh_r = NamedSharding(mesh, P("rows"))
    rep = NamedSharding(mesh, P())

    def pinned(tri_clip, tri_vary, valid):
        packed, v, bbox = stage(tri_clip, tri_vary, valid, W, H)
        packed = jax.lax.with_sharding_constraint(
            packed, NamedSharding(mesh, P("rows", None)))
        v = jax.lax.with_sharding_constraint(v, sh_r)
        bbox = tuple(jax.lax.with_sharding_constraint(c, sh_r)
                     for c in bbox)
        return packed, v, bbox

    f_rep = jax.jit(lambda c, a, v: stage(c, a, v, W, H))
    f_sh = jax.jit(pinned)

    args_rep = (jax.device_put(clip, rep), jax.device_put(vary, rep),
                jax.device_put(valid, rep))
    sh3 = NamedSharding(mesh, P("rows", None, None))
    args_sh = (jax.device_put(clip, sh3), jax.device_put(vary, sh3),
               jax.device_put(valid, sh_r))

    t_rep = bench(f_rep, args_rep)
    t_sh = bench(f_sh, args_sh)
    print(f"T={T}: setup+pack+bbox replicated {t_rep * 1e3:.1f} ms, "
          f"sharded over 8 'rows' {t_sh * 1e3:.1f} ms "
          f"-> {t_rep / t_sh:.2f}x")

    # ---- binning + raster stage (VERDICT r4 weak #2: the 'binned to
    # chips' half). Each multi-chip device runs bin_packed + the kernel
    # over ITS band. What the band-local cull in bin_packed buys, and
    # what it cannot: the LIVE stream/big entries (what the kernel
    # gathers windows for and evaluates — the dominant per-entry cost,
    # ~18.5-108 ns/entry on hardware) scale with band content; the XLA
    # candidate sorts and the stream row gather keep static shapes
    # (K*T keys / factor*T rows, dead slack sorted to the tail) because
    # capacity must be provisioned for the worst band — the demo/stress
    # horizon compresses a large fraction of all triangles into one
    # band (round-3 occupancy analysis: the worst HALF-frame group
    # needs 1.42/1.6 = 89% of the full stream), so scaling capacity by
    # band fraction would under-provision exactly where frames are
    # heaviest. Evidence printed: per-band live entries << full-frame
    # live entries; per-band bin TIME stays near full-frame (static
    # sort/gather floor — on hardware those are 15.8 + 4.6 of a 65.7 ms
    # stress device frame vs the kernel's 29.6).
    cfg = rp.RasterConfig(tile_h=8, chunk=64, stream_window=128,
                          stream_factor=1.6)
    # small, uniformly spread triangles so band-locality is real (the
    # stage() inputs above are huge cross-band triangles by design)
    centers = rng.uniform(0, 1, (T, 1, 2)).astype(np.float32)
    # ~2px triangles at 4K: ~1.1 incidences/tri, safely under the
    # stream capacity (factor 1.6) so live counts are uncapped
    small = centers + rng.uniform(0.0, 0.001,
                                  (T, 3, 2)).astype(np.float32)
    clip_s = jnp.concatenate([
        jnp.asarray(small * 2 - 1),
        jnp.ones((T, 3, 1), jnp.float32) * 0.5,
        jnp.ones((T, 3, 1), jnp.float32)], axis=-1)
    tc = rc.triangle_setup(clip_s, vary, valid, W, H, "none")
    packed = rc.pack_coeffs_full(tc)
    bbox = rp.viewport_bbox(clip_s, W, H)
    bin_full = jax.jit(rp.bin_packed, static_argnums=(3, 4, 5, 7))
    B = 8
    band = H // B

    def live(out):
        _s, _st, counts, _big, bigc, _t, _o = out
        return int(np.asarray(counts).sum() + np.asarray(bigc).sum())

    out_full = bin_full(packed, tc.valid, bbox, H, W, cfg,
                        jnp.int32(0), H)
    out_band = bin_full(packed, tc.valid, bbox, band, W, cfg,
                        jnp.int32(3 * band), H)
    t_full = bench(lambda *a: bin_full(packed, tc.valid, bbox, H, W,
                                       cfg, jnp.int32(0), H), ())
    t_band = bench(lambda *a: bin_full(packed, tc.valid, bbox, band, W,
                                       cfg, jnp.int32(3 * band), H), ())
    print(f"bin_packed T={T}: full frame {t_full * 1e3:.1f} ms / "
          f"{live(out_full)} live entries; one of {B} bands "
          f"{t_band * 1e3:.1f} ms / {live(out_band)} live entries -> "
          f"kernel work per band = "
          f"{live(out_band) / max(live(out_full), 1):.3f}x of full "
          f"(band-local cull), bin time {t_band / t_full:.2f}x "
          f"(static-shape sort/gather floor, see comment)")


if __name__ == "__main__":
    main()
