#!/usr/bin/env python
"""Reproduce the stress frame's 370 ms stream gather and test layout
fixes.

In the frame program, XLA lays out the packed coefficient table as
{0,1:T(8,128)} (dim0 minor) because its producer is a concat of [T]
column vectors; the row gather then reads 32 strided tiles per row.
Candidates:
  a) gather straight off the concat producer   (frame behavior)
  b) flatten + optimization_barrier + reshape  (forces standard layout)
  c) matmul with identity                      (dot output layout)

Timing via forced host readback of one element (block_until_ready is
not reliable through the relay).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

T = 1_012_528
E = 8_100_224


def _force(out):
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf.ravel()[:1])


def timeit(label, fn, variants, n=5):
    _force(fn(*variants[0]))
    t0 = time.perf_counter()
    for i in range(n):
        _force(fn(*variants[i % len(variants)]))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label}: {dt:.3f} ms", flush=True)
    return dt


def make_packed_like_setup(cols):
    """Build the [T, 32] table the way pack_coeffs_full does: a concat
    of per-coefficient [T] vectors -> XLA favors a dim0-minor layout."""
    parts = [c * 1.0001 + 0.5 for c in cols]            # simulated setup
    return jnp.stack(parts, axis=1)                     # [T, 32]


def main():
    key = jax.random.PRNGKey(1)

    @jax.jit
    def gen(k):
        k1, k2 = jax.random.split(k)
        cols = jax.random.uniform(k1, (32, T), jnp.float32)
        idx = jax.random.randint(k2, (E,), 0, T, jnp.int32)
        return cols, idx

    variants = []
    for i in range(5):
        cols, idx = gen(jax.random.fold_in(key, i))
        variants.append((jax.block_until_ready(cols),
                         jax.block_until_ready(idx)))

    noop = jax.jit(lambda c, i: c[0, 0])
    timeit("noop (overhead)     ", noop, variants)

    @jax.jit
    def gather_asis(cols, idx):
        packed = make_packed_like_setup(list(cols))
        return packed[idx].sum(axis=0)

    @jax.jit
    def gather_barrier(cols, idx):
        packed = make_packed_like_setup(list(cols))
        flat = lax.optimization_barrier(packed.reshape(-1))
        packed = flat.reshape(T, 32)
        return packed[idx].sum(axis=0)

    @jax.jit
    def gather_dot(cols, idx):
        packed = make_packed_like_setup(list(cols))
        packed = packed @ jnp.eye(32, dtype=jnp.float32)
        return packed[idx].sum(axis=0)

    timeit("gather as-is        ", gather_asis, variants)
    timeit("gather barrier-flat ", gather_barrier, variants)
    timeit("gather identity-dot ", gather_dot, variants)


if __name__ == "__main__":
    main()
