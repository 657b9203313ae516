"""Probe: where do the extrema-stage milliseconds go? (real chip)

Splits detect_extrema_all into (a) extremum masks only, (b) mask+concat+
popcount/csum, (c) full compact, and times the candidate Pallas mask kernel
against the XLA shift-reduction mask.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _fence(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, reps=10, k=8):
    _fence(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn()
        _fence(out)
        ts.append((time.perf_counter() - t0) / k)
    return statistics.median(ts) * 1e3


def main() -> None:
    os.makedirs("/root/.cache/jax_tpu_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sift_tpu import SiftConfig
    from sift_tpu.models import sift as S
    from sift_tpu.models.detect import extremum_mask
    from sift_tpu.ops.gather import compact_mask
    from sift_tpu.utils.io import load_image

    cave = "/root/reference/stitching/collection/Dataset/CAVE-01_atrium"
    img1 = load_image(f"{cave}/00.jpg")
    img2 = load_image(f"{cave}/01.jpg")
    cfg = SiftConfig(extrema_cap=6144, kp_cap=1536, ori_cap=2048)
    B = 16
    imgs = jnp.asarray(np.stack([img1, img2] * (B // 2)).astype(np.float32))
    h, w = imgs.shape[1], imgs.shape[2]
    octaves = cfg.octaves_count(w * 2, h * 2)
    gaussians, dogs = S._jit_pyramids_batch(imgs, cfg, octaves)
    thr = cfg.extremum_threshold()

    @jax.jit
    def masks_only(dogs):
        return [
            jax.vmap(lambda d: extremum_mask(d, thr, cfg.window_size))(d)
            for d in dogs
        ]

    print(f"masks only (XLA):        {timeit(lambda: masks_only(dogs)):8.3f} ms")

    @jax.jit
    def masks_concat(dogs):
        ms = [
            jax.vmap(lambda d: extremum_mask(d, thr, cfg.window_size))(d)
            for d in dogs
        ]
        return jnp.concatenate([m.reshape(B, -1) for m in ms], axis=1)

    print(f"masks+concat (XLA):      {timeit(lambda: masks_concat(dogs)):8.3f} ms")

    flat = masks_concat(dogs)

    @jax.jit
    def compact_only(flat):
        return jax.vmap(lambda f: compact_mask(f, cfg.extrema_cap))(flat)

    print(f"compact only:            {timeit(lambda: compact_only(flat)):8.3f} ms")

    @jax.jit
    def popcount_only(flat):
        n = flat.shape[1]
        rw = 256
        nr = -(-n // rw)
        pad = nr * rw - n
        f = jnp.pad(flat, ((0, 0), (0, pad)))
        return jnp.cumsum(
            jnp.sum(f.reshape(B, nr, rw), axis=2, dtype=jnp.int32), axis=1
        )

    print(f"popcount+csum only:      {timeit(lambda: popcount_only(flat)):8.3f} ms")


if __name__ == "__main__":
    main()
