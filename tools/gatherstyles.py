#!/usr/bin/env python
"""Measure the primitive data-movement options for building a bin-order
coefficient stream, to pick the rasterizer's binning architecture:

  a) XLA row gather  [T,32]  -> [E,32]   (current design: 370 ms/frame!)
  b) XLA row gather  [T,128] -> [E,128]  (lane-aligned rows)
  c) 1-D take of E elements from [T] f32 (planar SoA, x32 per frame)
  d) key-only sort (i32, E)              (baseline: ~6 ms at 8M)
  e) variadic co-sort: key + 4 / 8 f32 payload operands (fuses
     sort+gather: payload rows ride the sort network)

Honest timing: distinct inputs per call, block per call.
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _force(out):
    import numpy as np
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf.ravel()[:1])


def timeit(label, fn, variants, n=6):
    _force(fn(*variants[0]))
    t0 = time.perf_counter()
    for i in range(n):
        _force(fn(*variants[i % len(variants)]))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label}: {dt:.3f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=1_012_528)
    ap.add_argument("--e", type=int, default=8_100_224)
    args = ap.parse_args()
    T, E = args.t, args.e

    key = jax.random.PRNGKey(0)

    @jax.jit
    def gen(k):
        k1, k2 = jax.random.split(k)
        idx = jax.random.randint(k1, (E,), 0, T, jnp.int32)
        tab32 = jax.random.uniform(k2, (T, 32), jnp.float32)
        return idx, tab32

    variants = []
    for i in range(6):
        idx, tab = gen(jax.random.fold_in(key, i))
        variants.append((jax.block_until_ready(idx),
                         jax.block_until_ready(tab)))

    timeit("row gather [T,32] ", jax.jit(lambda i, t: t[i]), variants)
    timeit("row gather [T,128]", jax.jit(
        lambda i, t: jnp.tile(t, (1, 4))[i]), variants)
    timeit("1-D take x1       ", jax.jit(lambda i, t: t[:, 0][i]),
           variants)
    timeit("1-D take x8       ", jax.jit(
        lambda i, t: [t[:, c][i] for c in range(8)]), variants)
    timeit("sort key only     ", jax.jit(
        lambda i, t: jnp.sort(i, stable=False)), variants)

    def cosort(width):
        def f(i, t):
            ops = (i,) + tuple(
                (i * (c + 1)).astype(jnp.float32) for c in range(width))
            return jax.lax.sort(ops, num_keys=1)
        return jax.jit(f)

    timeit("co-sort key+4xf32 ", cosort(4), variants)
    timeit("co-sort key+8xf32 ", cosort(8), variants)


if __name__ == "__main__":
    main()
