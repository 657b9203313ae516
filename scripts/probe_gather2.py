"""Probe lax.gather window-slice variants vs the twin-block row gathers."""
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


def timeit(name, fn, reps=6, k=8):
    fence(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn()
        fence(out)
        ts.append((time.perf_counter() - t0) / k)
    print(f"{name:56s} {statistics.median(ts)*1e3:9.3f} ms")


rng = np.random.default_rng(0)
N = 6144 * 8
R = 600_000
rows = jnp.asarray(rng.uniform(size=(R, 128)).astype(np.float32))

# --- cube-style: need (N, 3z, 3y, 128): compare formulations ---
ridx9 = jnp.asarray(rng.integers(0, R - 1, size=(N, 9)).astype(np.int32))
g9 = jax.jit(lambda r, i: r[i.reshape(-1)].reshape(N, 9, 128))
timeit("baseline: 9 single-row gathers (adv idx)", lambda: g9(rows, ridx9))

starts3 = jnp.asarray(rng.integers(0, R - 4, size=(N * 3,)).astype(np.int32))


def win_gather(r, s, rows_per, L):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,),
    )
    return jax.lax.gather(
        r, s[:, None], dn, slice_sizes=(rows_per, L),
        mode=jax.lax.GatherScatterMode.CLIP,
    )


w3 = jax.jit(lambda r, s: win_gather(r, s, 3, 128))
timeit("3-row window gather x3/lane (lax.gather)", lambda: w3(rows, starts3))

# --- patch-style: 32-row windows (descriptor/orient patches) ---
M = 2048 * 8
startsP = jnp.asarray(rng.integers(0, R - 40, size=(M,)).astype(np.int32))
wP = jax.jit(lambda r, s: win_gather(r, s, 32, 128))
timeit("32-row window gather (M=16k) via lax.gather", lambda: wP(rows, startsP))

ridx32 = jnp.asarray(
    (np.asarray(startsP)[:, None] + np.arange(32)[None, :]).astype(np.int32)
)
g32 = jax.jit(lambda r, i: r[i.reshape(-1)].reshape(M, 32, 128))
timeit("32 single-row gathers (adv idx)", lambda: g32(rows, ridx32))

# --- 2D-start window gather from a plain (H, Wpad) image: aligned cols ---
H2, W2 = 6000, 1408  # padded width, 128-aligned
img = jnp.asarray(rng.uniform(size=(H2, W2)).astype(np.float32))
ys = jnp.asarray(rng.integers(0, H2 - 40, size=(M,)).astype(np.int32))
bs = jnp.asarray((rng.integers(0, (W2 - 256) // 128, size=(M,)) * 128).astype(np.int32))


def win2d(im, y, b, ph, pw):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1),
    )
    s = jnp.stack([y, b], axis=1)
    return jax.lax.gather(
        im, s, dn, slice_sizes=(ph, pw), mode=jax.lax.GatherScatterMode.CLIP
    )


w2d = jax.jit(lambda im, y, b: win2d(im, y, b, 32, 256))
timeit("2D-start 32x256 window gather (no relayout)", lambda: w2d(img, ys, bs))

w2du = jax.jit(lambda im, y, b: win2d(im, y, b + 1, 32, 256))
timeit("2D-start 32x256 UNALIGNED col starts", lambda: w2du(img, ys, b=bs))
