"""Bisect gather_cubes_multi: row-gather vs one-hot extraction cost."""
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
    print(f"{name:52s} {statistics.median(ts)*1e3:9.3f} ms")
    return fn()


rng = np.random.default_rng(0)
N = 6144 * 8  # lanes across the batch
R = 600_000  # total rows in the gather space
rows = jnp.asarray(rng.uniform(size=(R, 128)).astype(np.float32))
ridx9 = jnp.asarray(rng.integers(0, R - 1, size=(N, 9)).astype(np.int32))
ox = jnp.asarray(rng.integers(0, 125, size=(N,)).astype(np.int32))

g9 = jax.jit(lambda r, i: r[i.reshape(-1)].reshape(N, 9, 128))
got = timeit("row gather 9 rows/lane (442k x 128)", lambda: g9(rows, ridx9))

from sift_tpu.ops.gather import extract_cols

ex = jax.jit(lambda g, o: extract_cols(g, o, 3))
timeit("extract_cols einsum (N,9,128)->(N,9,3)", lambda: ex(got, ox))

full = jax.jit(lambda r, i, o: extract_cols(r[i.reshape(-1)].reshape(N, 9, 128), o, 3))
timeit("gather+extract fused", lambda: full(rows, ridx9, ox))

# narrower gather rows: 3 wide-rows (z planes) of 3*128 lanes
rows384 = jnp.asarray(rng.uniform(size=(R // 3, 384)).astype(np.float32))
ridx3 = jnp.asarray(rng.integers(0, R // 3 - 1, size=(N, 3)).astype(np.int32))
g3 = jax.jit(lambda r, i: r[i.reshape(-1)].reshape(N, 3, 384))
timeit("row gather 3 rows/lane (147k x 384)", lambda: g3(rows384, ridx3))

# take-based gather instead of advanced indexing
gt = jax.jit(lambda r, i: jnp.take(r, i.reshape(-1), axis=0).reshape(N, 9, 128))
timeit("jnp.take 9 rows/lane", lambda: gt(rows, ridx9))

# extraction via 2 shifted dots? measure einsum with bf16-safe default prec
ex_dflt = jax.jit(
    lambda g, o: jnp.einsum(
        "nrl,nlc->nrc",
        g,
        (jnp.arange(128, dtype=jnp.int32)[None, :, None]
         == (o[:, None, None] + jnp.arange(3)[None, None, :])).astype(jnp.float32),
    )
)
timeit("extract einsum DEFAULT precision", lambda: ex_dflt(got, ox))

# extraction via weighted sum trick: one-hot as (N, 1, 128) select + rolls
def ex_roll(g, o):
    # cube columns ox, ox+1, ox+2: select each by mask + sum over lanes
    lanes = jnp.arange(128, dtype=jnp.int32)[None, None, :]
    outs = []
    for c in range(3):
        m = (lanes == (o[:, None, None] + c)).astype(g.dtype)
        outs.append(jnp.sum(g * m, axis=-1))
    return jnp.stack(outs, axis=-1)


exr = jax.jit(ex_roll)
timeit("extract via mask+sum (VPU)", lambda: exr(got, ox))
