"""A/B the dedup+compact stage: lexsort+gathers vs payload-carrying sorts."""
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

from sift_tpu.utils import keypoints as kputil


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


rng = np.random.default_rng(5)
for B, cap in [(8, 8192), (16, 3072)]:
    n_dup = cap // 8

    def mk(_):
        x = rng.uniform(0, 640, cap).astype(np.float32)
        y = rng.uniform(0, 480, cap).astype(np.float32)
        size = rng.uniform(1, 8, cap).astype(np.float32)
        pori = rng.uniform(0, 6.28, cap).astype(np.float32)
        octv = rng.integers(0, 8, cap).astype(np.int32)
        layer = rng.integers(1, 4, cap).astype(np.int32)
        valid = rng.uniform(size=cap) < 0.6
        for _ in range(n_dup):
            i, j = rng.integers(0, cap, 2)
            x[j], y[j], size[j], pori[j] = x[i], y[i], size[i], pori[i]
            valid[i] = valid[j] = True
        return dict(x=x, y=y, size=size, pori=pori, octave=octv,
                    layer=layer, valid=valid)

    hosts = [mk(i) for i in range(B)]
    kp = kputil.Keypoints(
        x=jnp.asarray(np.stack([h["x"] for h in hosts])),
        y=jnp.asarray(np.stack([h["y"] for h in hosts])),
        octave=jnp.asarray(np.stack([h["octave"] for h in hosts])),
        layer=jnp.asarray(np.stack([h["layer"] for h in hosts])),
        size=jnp.asarray(np.stack([h["size"] for h in hosts])),
        pori=jnp.asarray(np.stack([h["pori"] for h in hosts])),
        desc=jnp.zeros((B, cap, 128), jnp.uint8),
        valid=jnp.asarray(np.stack([h["valid"] for h in hosts])),
    )

    old = jax.jit(jax.vmap(
        lambda c: kputil.compact(kputil.sort_and_dedup(c), cap)
    ))
    new = jax.jit(jax.vmap(lambda c: kputil.dedup_compact(c, cap)))

    a, b = old(kp), new(kp)
    va, vb = np.asarray(a.valid), np.asarray(b.valid)
    assert (va == vb).all()
    for f in ("x", "y", "octave", "layer", "size", "pori"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f))[va], np.asarray(getattr(b, f))[vb]
        )
    print(f"B={B} cap={cap}: outputs identical")
    timeit(f"old lexsort+compact  B={B} cap={cap}", lambda: old(kp))
    timeit(f"new payload sorts    B={B} cap={cap}", lambda: new(kp))
