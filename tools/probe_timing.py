#!/usr/bin/env python
"""Probe whether block_until_ready is trustworthy under the axon relay.

Runs a matmul chain of known FLOP cost with varying iteration counts k;
if block_until_ready time does not scale with k but np.asarray of a
scalar reduction does, ready-events are unreliable and ALL timing must
force a scalar readback.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

N = 8192  # 8k x 8k f32 matmul = 1.1 TFLOP per iter -> ~3-6 ms on v5e


@partial(jax.jit, static_argnums=1)
def chain(x, k):
    def body(i, a):
        return a @ x
    return jax.lax.fori_loop(0, k, body, x)


x = jnp.eye(N, dtype=jnp.float32) * 1.000001

for k in (1, 8, 64):
    out = chain(x, k)          # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chain(x * jnp.float32(1.0 + k * 2**-20), k)
    jax.block_until_ready(out)
    t_block = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = float(np.asarray(out[0, 0]))
    t_read = time.perf_counter() - t0
    print(f"k={k:3d}  block_until_ready={t_block*1e3:8.2f} ms   "
          f"scalar-readback(after block)={t_read*1e3:8.2f} ms  val={s:.3f}",
          flush=True)

# same, but readback WITHOUT blocking first
for k in (1, 8, 64):
    t0 = time.perf_counter()
    out = chain(x * jnp.float32(1.0 + (k + 7) * 2**-20), k)
    s = float(np.asarray(out[0, 0]))
    t_read = time.perf_counter() - t0
    print(f"k={k:3d}  dispatch+scalar-readback={t_read*1e3:8.2f} ms  "
          f"val={s:.3f}", flush=True)
