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


if __name__ == "__main__":
    main()
