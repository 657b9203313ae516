"""Measure per-program dispatch overhead on the axon tunnel, and A/B the
bench sweep as chained stage programs vs one fused jit program."""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/.cache/jax_tpu_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def fence(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def timeit(name, fn, reps=8, k=8):
    fence(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn()
        fence(out)
        ts.append((time.perf_counter() - t0) / k)
    print(f"{name:46s} {statistics.median(ts)*1e3:9.3f} ms")


tiny = jnp.ones((8, 8), jnp.float32)
f_tiny = jax.jit(lambda x: x + 1)
timeit("trivial program (8x8 add)", lambda: f_tiny(tiny))

small = jnp.ones((128, 128), jnp.float32)
f2 = jax.jit(lambda x: x @ x)
timeit("small matmul program (128x128)", lambda: f2(small))

big = jnp.ones((8, 960, 1280), jnp.float32)
f3 = jax.jit(lambda x: x * 2 + 1)
timeit("big elementwise (8x960x1280, 39MB r+w)", lambda: f3(big))


# chain of 6 trivial programs
def chain6(x):
    for _ in range(6):
        x = f_tiny(x)
    return x


timeit("chain of 6 trivial programs", lambda: chain6(tiny))
