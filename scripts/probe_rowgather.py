"""Probe TPU row-gather and one-hot-extract primitive throughput."""
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
    return np.asarray(leaf[(0,) * leaf.ndim]) if leaf.ndim else np.asarray(leaf)


def timeit(name, fn, bytes_moved=None, reps=5, k=4):
    fence(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn()
        fence(out)
        ts.append((time.perf_counter() - t0) / k)
    med = statistics.median(ts)
    bw = f"  {bytes_moved/med/1e9:8.1f} GB/s" if bytes_moved else ""
    print(f"{name:52s} {med*1e3:9.2f} ms{bw}")


rng = np.random.default_rng(0)
D, H, W = 5, 960, 1280
img = jnp.asarray(rng.normal(0, 20, (D * H, W)).astype(np.float32))

# 1. row gather: N full rows of width W
for N in (8192, 73728):
    idx = jnp.asarray(rng.integers(0, D * H, (N,)), jnp.int32)
    f = jax.jit(lambda i, im=img: jnp.take(im, i, axis=0))
    timeit(f"row gather N={N} x{W} f32", lambda f=f, i=idx: f(i),
           bytes_moved=N * W * 4)

# 2. 128-wide block gather: reshape to (D*H*W/128, 128), gather blocks
blocks = img.reshape(D * H * W // 128, 128)
for N in (8192, 73728, 8192 * 37 * 2):
    idx = jnp.asarray(rng.integers(0, blocks.shape[0], (N,)), jnp.int32)
    f = jax.jit(lambda i, b=blocks: jnp.take(b, i, axis=0))
    timeit(f"block gather N={N} x128 f32", lambda f=f, i=idx: f(i),
           bytes_moved=N * 128 * 4)

# 3. one-hot column extract via matmul: (N, 128) rows -> (N, 37) cols
N = 8192 * 9
rows = jnp.asarray(rng.normal(0, 1, (N, 128)).astype(np.float32))
offs = jnp.asarray(rng.integers(0, 128 - 37, (N,)), jnp.int32)


def onehot_extract(rows, offs):
    # out[n, j] = rows[n, offs[n] + j], j in [0, 37)
    lane = jnp.arange(128, dtype=jnp.int32)[None, :]
    j = jnp.arange(37, dtype=jnp.int32)
    oh = (lane[:, :, None] == (offs[:, None, None] + j[None, None, :])).astype(
        rows.dtype
    )  # (N, 128, 37)
    return jnp.einsum("nk,nkj->nj", rows, oh)


f_oh = jax.jit(onehot_extract)
timeit(f"one-hot col extract N={N} 128->37", lambda: f_oh(rows, offs))


# 4. alternative: vmapped dynamic_slice on rows (lane-dim slice)
def ds_extract(rows, offs):
    return jax.vmap(lambda r, o: jax.lax.dynamic_slice(r, (o,), (37,)))(rows, offs)

f_ds = jax.jit(ds_extract)
timeit(f"dyn-slice col extract N={N} 128->37", lambda: f_ds(rows, offs))

a = np.asarray(f_oh(rows, offs))
b = np.asarray(f_ds(rows, offs))
print("extract agreement:", (a == b).all())

# 5. scatter-add reference point: N indices into (8192,) buffer
N = 8192 * 36
si = jnp.asarray(rng.integers(0, 8192, (N,)), jnp.int32)
sv = jnp.asarray(rng.normal(0, 1, (N,)).astype(np.float32))
f_sc = jax.jit(lambda i, v: jnp.zeros((8192,), jnp.float32).at[i].add(v))
timeit(f"scatter-add N={N} into 8192", lambda: f_sc(si, sv))
