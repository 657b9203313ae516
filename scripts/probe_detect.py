"""Bisect detect+refine cost on the real chip at bench capacities."""
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

from sift_tpu import SiftConfig
from sift_tpu.models import sift as S
from sift_tpu.models.detect import (
    detect_extrema_all,
    extremum_mask,
    refine_keypoints_all,
)
from sift_tpu.ops.gather import build_multi_rows, compact_mask, gather_cubes_multi
from sift_tpu.utils.io import load_image

cave = "/root/reference/stitching/collection/Dataset/CAVE-01_atrium"
img1 = load_image(f"{cave}/00.jpg")
img2 = load_image(f"{cave}/01.jpg")
B = 8
imgs = jnp.asarray(np.stack([img1, img2] * (B // 2)).astype(np.float32))
cfg = SiftConfig(extrema_cap=6144, kp_cap=1536, ori_cap=2048)
octaves = cfg.octaves_count(640 * 2, 480 * 2)


def fence(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


FENCE_MS = None


def timeit(name, fn, reps=6, k=8):
    fence(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn()
        fence(out)
        ts.append((time.perf_counter() - t0) / k)
    med = statistics.median(ts) * 1e3
    adj = med - (FENCE_MS or 0.0)
    print(f"{name:46s} {med:9.3f} ms   (true ~{adj:8.3f})")
    return fn()


# calibrate fence cost
tiny = jnp.ones((8, 8), jnp.float32)
f_tiny = jax.jit(lambda x: x + 1)
fence(f_tiny(tiny))
ts = []
for _ in range(10):
    t0 = time.perf_counter()
    for _ in range(8):
        out = f_tiny(out if False else tiny) if False else f_tiny(tiny)
    fence(out)
    ts.append((time.perf_counter() - t0) / 8)
FENCE_MS = statistics.median(ts) * 1e3
print(f"fence+overhead per k=8 window: {FENCE_MS:.3f} ms")

gaussians, dogs = S._jit_pyramids_batch(imgs, cfg, octaves)
fence(dogs)

thr = cfg.extremum_threshold()


@jax.jit
def masks_only(dogs):
    return [jax.vmap(lambda d: extremum_mask(d, thr, cfg.window_size))(d)
            for d in dogs]


timeit("extremum masks only (all octaves)", lambda: masks_only(dogs))


@jax.jit
def extrema_full(dogs):
    return jax.vmap(
        lambda d: detect_extrema_all(d, thr, cfg.extrema_cap, cfg.window_size)
    )(dogs)


oct_id, zyx, valid, tot = timeit("extrema + compact (cap 6144)",
                                 lambda: extrema_full(dogs))


# compact alone on a precomputed flat mask
@jax.jit
def flat_masks(dogs):
    ms = [jax.vmap(lambda d: extremum_mask(d, thr, cfg.window_size))(d)
          for d in dogs]
    return jnp.concatenate([m.reshape(B, -1) for m in ms], axis=1)


flat = flat_masks(dogs)
fence(flat)
print(f"flat mask lanes per frame: {flat.shape[1]}")

for rw in (256, 512, 1024, 2048):
    cm = jax.jit(jax.vmap(lambda f: compact_mask(f, cfg.extrema_cap, rw)))
    timeit(f"compact_mask rw={rw} (cap 6144)", lambda: cm(flat))


@jax.jit
def refine_full(dogs, oct_id, zyx, valid):
    return jax.vmap(lambda d, o, z, v: refine_keypoints_all(
        [dd for dd in d], o, z, v, cfg))(dogs, oct_id, zyx, valid)


timeit("refine (two-phase, cap 6144)", lambda: refine_full(dogs, oct_id, zyx, valid))


@jax.jit
def mr_build(dogs):
    return jax.vmap(lambda d: build_multi_rows([dd for dd in d], blk=64))(dogs)


mr = timeit("build_multi_rows(dogs) blk=64", lambda: mr_build(dogs))


@jax.jit
def cubes_once(mr, oct_id, zyx):
    return jax.vmap(lambda m, o, p: gather_cubes_multi(m, o, p))(mr, oct_id, zyx)


timeit("gather cubes 6144 lanes x1", lambda: cubes_once(mr, oct_id, zyx))
