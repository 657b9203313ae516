"""Separate per-program dispatch cost from D2H fence RTT: vary enqueue depth k."""
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

rng = np.random.default_rng(0)

# tiny program: add scalar to small array
small = jnp.ones((8, 128), jnp.float32)
f_tiny = jax.jit(lambda x: x + 1.0)

# medium gather
D, H, W = 5, 960, 1280
img = jnp.asarray(rng.normal(0, 20, (D * H, W)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, D * H, (8192,)), jnp.int32)
f_row = jax.jit(lambda i: jnp.take(img, i, axis=0))

# big matmul for reference (known flops)
a = jnp.asarray(rng.normal(0, 1, (4096, 4096)).astype(np.float32))
f_mm = jax.jit(lambda x: x @ x)


def fence(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


for name, f, arg in (("tiny add", f_tiny, small), ("row gather 8192", f_row, idx),
                     ("matmul 4096^3", f_mm, a)):
    fence(f(arg))
    for k in (1, 4, 16, 64):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(k):
                out = f(arg)
            fence(out)
            ts.append((time.perf_counter() - t0) / k)
        print(f"{name:18s} k={k:3d}  {statistics.median(ts)*1e3:8.3f} ms/call")
