"""Prototype faster extrema-compaction and cube-gather formulations."""
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


def timeit(name, fn, reps=5, k=4):
    fence(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn()
        fence(out)
        ts.append((time.perf_counter() - t0) / k)
    print(f"{name:46s} {statistics.median(ts)*1e3:9.2f} ms")


rng = np.random.default_rng(0)
B, D, H, W = 8, 5, 960, 1280
dog = jnp.asarray(rng.normal(0, 20, (B, D, H, W)).astype(np.float32))
cap = 8192

# --- A. extrema: reduce_window alone vs + nonzero vs sort-compaction ---
def ext_pools(d):
    wmax = jax.lax.reduce_window(d, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "VALID")
    wmin = jax.lax.reduce_window(d, jnp.inf, jax.lax.min, (3, 3, 3), (1, 1, 1), "VALID")
    c = d[1:-1, 1:-1, 1:-1]
    return (jnp.abs(c) > 1.0) & ((c >= wmax) | (c <= wmin))

f_pool = jax.jit(jax.vmap(ext_pools))
timeit("A1 reduce_window pools only", lambda: f_pool(dog))
mask = f_pool(dog)


def compact_nonzero(m):
    flat = m.reshape(-1)
    n = flat.shape[0]
    idx = jnp.nonzero(flat, size=cap, fill_value=n)[0]
    return idx

f_nz = jax.jit(jax.vmap(compact_nonzero))
timeit("A2 nonzero(size=8192) on mask", lambda: f_nz(mask))


def compact_sort(m):
    flat = m.reshape(-1)
    n = flat.shape[0]
    key = jnp.where(flat, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    # ascending sort: extrema indices first, invalid = n
    return jax.lax.sort(key)[:cap]

f_srt = jax.jit(jax.vmap(compact_sort))
timeit("A3 sort-compaction on mask", lambda: f_srt(mask))


def compact_topk(m):
    flat = m.reshape(-1)
    n = flat.shape[0]
    key = jnp.where(flat, -jnp.arange(n, dtype=jnp.int32), -jnp.int32(n + 1))
    vals, _ = jax.lax.top_k(key, cap)
    return -vals

f_tk = jax.jit(jax.vmap(compact_topk))
timeit("A4 top_k-compaction on mask", lambda: f_tk(mask))


def compact_blocked(m):
    """Two-level: per-block cumsum (vectorized) then block-offset scatter."""
    flat = m.reshape(-1)
    n = flat.shape[0]
    BS = 4096
    nb = -(-n // BS)
    pad = nb * BS - n
    flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    blocks = flat.reshape(nb, BS)
    within = jnp.cumsum(blocks, axis=1) - blocks  # exclusive, per block
    counts = jnp.sum(blocks, axis=1)
    offs = jnp.cumsum(counts) - counts
    dest = (offs[:, None] + within).astype(jnp.int32)
    src = jnp.arange(nb * BS, dtype=jnp.int32).reshape(nb, BS)
    out = jnp.full((cap,), n, jnp.int32)
    dest = jnp.where(blocks, dest, cap + 7)  # drop non-extrema
    return out.at[dest.reshape(-1)].set(src.reshape(-1), mode="drop")

f_blk = jax.jit(jax.vmap(compact_blocked))
timeit("A5 blocked cumsum+scatter", lambda: f_blk(mask))

# --- B. cube gather: vmapped dynamic_slice vs 27 flat takes ---
zyx = jnp.stack(
    [
        jnp.asarray(rng.integers(1, D - 1, (B, cap)), jnp.int32),
        jnp.asarray(rng.integers(1, H - 1, (B, cap)), jnp.int32),
        jnp.asarray(rng.integers(1, W - 1, (B, cap)), jnp.int32),
    ],
    axis=-1,
)


def cubes_ds(d, p):
    def one(q):
        return jax.lax.dynamic_slice(d, (q[0] - 1, q[1] - 1, q[2] - 1), (3, 3, 3))
    return jax.vmap(one)(p)

f_ds = jax.jit(jax.vmap(cubes_ds))
timeit("B1 vmapped dynamic_slice cube (1 step)", lambda: f_ds(dog, zyx))


def cubes_take(d, p):
    flat = d.reshape(-1)
    z, y, x = p[:, 0], p[:, 1], p[:, 2]
    base = (z * H + y) * W + x
    outs = []
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                outs.append(jnp.take(flat, base + ((dz * H + dy) * W + dx)))
    return jnp.stack(outs, axis=-1).reshape(-1, 3, 3, 3)

f_tt = jax.jit(jax.vmap(cubes_take))
timeit("B2 27 flat takes cube (1 step)", lambda: f_tt(dog, zyx))


def cubes_onetake(d, p):
    flat = d.reshape(-1)
    z, y, x = p[:, 0], p[:, 1], p[:, 2]
    base = (z * H + y) * W + x
    off = jnp.asarray(
        [(dz * H + dy) * W + dx for dz in (-1, 0, 1) for dy in (-1, 0, 1)
         for dx in (-1, 0, 1)], jnp.int32)
    idx = base[:, None] + off[None, :]
    return jnp.take(flat, idx).reshape(-1, 3, 3, 3)

f_ot = jax.jit(jax.vmap(cubes_onetake))
timeit("B3 one 27-wide take cube (1 step)", lambda: f_ot(dog, zyx))

# agreement
a = np.asarray(f_ds(dog, zyx))
b = np.asarray(f_tt(dog, zyx))
c = np.asarray(f_ot(dog, zyx))
print("cube agreement:", (a == b).all(), (a == c).all())
i1 = np.asarray(f_nz(mask))
i3 = np.asarray(f_srt(mask))
i4 = np.asarray(f_tk(mask))
i5 = np.asarray(f_blk(mask))
n = D_ = (D - 2) * (H - 2) * (W - 2)
print("compaction agreement:", (i1 == i3).all(), (i1 == i4).all(),
      (np.where(i1 < n, i1, -1) == np.where(i5 < n, i5, -1)).all())
