#!/usr/bin/env python
"""Microbenchmark for the tiny-triangle splat resolve primitives:
scatter-min (depth), masked equality scatter (winner id), and a
3-operand sort alternative — to decide how the micropolygon path should
resolve depth on TPU.

Honest timing: distinct input bits per call (see kbench docstring).

Usage: python tools/scatterbench.py [--e 16000000] [--pix 8294400]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _force(out):
    # block_until_ready is NOT reliable through the axon relay for some
    # executions; a tiny host readback of each output forces completion
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf.ravel()[:1])


def timeit(label, fn, variants, n=8):
    _force(fn(*variants[0]))
    t0 = time.perf_counter()
    for i in range(n):
        _force(fn(*variants[i % len(variants)]))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label}: {dt:.3f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--e", type=int, default=16_000_000,
                    help="candidate count (tiny tris x 16)")
    ap.add_argument("--pix", type=int, default=3840 * 2160)
    args = ap.parse_args()
    E, NPIX = args.e, args.pix

    key = jax.random.PRNGKey(0)

    @jax.jit
    def gen(k):
        kp, kz = jax.random.split(k)
        pix = jax.random.randint(kp, (E,), 0, NPIX, jnp.int32)
        z = jax.random.uniform(kz, (E,), jnp.float32)
        return pix, z

    variants = []
    for i in range(8):
        pix, z = gen(jax.random.fold_in(key, i))
        variants.append((jax.block_until_ready(pix),
                         jax.block_until_ready(z)))

    @jax.jit
    def scatter_min(pix, z):
        d = jnp.full((NPIX,), 1.0, jnp.float32)
        return d.at[pix].min(z, mode="drop")

    @jax.jit
    def scatter_min_2pass(pix, z):
        # full winner resolve: depth scatter-min, then id scatter-min of
        # exact-z matches (the tie-break), like the splat path would
        d = jnp.full((NPIX,), 1.0, jnp.float32)
        d = d.at[pix].min(z, mode="drop")
        ids = jnp.arange(E, dtype=jnp.int32)
        hit = z == d[pix]
        wid = jnp.where(hit, ids, jnp.int32(2**31 - 1))
        w = jnp.full((NPIX,), 2**31 - 1, jnp.int32)
        return w.at[pix].min(wid, mode="drop")

    @jax.jit
    def sort3(pix, z):
        ids = jnp.arange(E, dtype=jnp.int32)
        return jax.lax.sort((pix, z, ids), num_keys=3)

    @jax.jit
    def seg_sorted_scatter(pix, z):
        # sorted-pixel variant: does pre-sorting make scatter faster?
        p2, z2 = jax.lax.sort((pix, z), num_keys=1)
        d = jnp.full((NPIX,), 1.0, jnp.float32)
        return d.at[p2].min(z2, mode="drop")

    timeit("scatter-min        ", scatter_min, variants)
    timeit("scatter-min+idpass ", scatter_min_2pass, variants)
    timeit("sort3 (pix,z,id)   ", sort3, variants)
    timeit("sort1+scatter-min  ", seg_sorted_scatter, variants)


if __name__ == "__main__":
    main()
