"""Probe: does the first D2H poison async dispatch, or is the sweep slow?

Modes (run each in a FRESH process):
  a: warmup block_until_ready only; time K sweeps ending in ONE D2H fence.
  b: warmup with D2H fence; time K sweeps ending in one D2H fence (bench.py).
  c: round-1 method: block_until_ready per sweep, no D2H ever.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode = sys.argv[1]

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/.cache/jax_tpu_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sift_tpu import SiftConfig, match_descriptors
from sift_tpu.models.sift import detect_and_describe_batch
from sift_tpu.utils.io import load_image

cave = "/root/reference/stitching/collection/Dataset/CAVE-01_atrium"
img1 = load_image(f"{cave}/00.jpg")
img2 = load_image(f"{cave}/01.jpg")
cfg = SiftConfig()
B = 8
imgs = jnp.asarray(np.stack([img1, img2] * (B // 2)).astype(np.float32))
matcher = jax.jit(
    jax.vmap(match_descriptors, in_axes=(0, 0, 0, 0, None)), static_argnums=(4,)
)


def sweep():
    kp = detect_and_describe_batch(imgs, cfg)
    _, accept, _, _ = matcher(
        kp.desc[0::2], kp.valid[0::2], kp.desc[1::2], kp.valid[1::2],
        cfg.ratio_threshold,
    )
    return accept


K = 10
if mode == "a":
    jax.block_until_ready(sweep())  # warmup, no D2H
    t0 = time.perf_counter()
    for _ in range(K):
        acc = sweep()
    v = np.asarray(acc)[0, 0]  # single D2H fence inside timed window
    dt = time.perf_counter() - t0
    print(f"mode a: {dt/K*1e3:.1f} ms/sweep ({B*K/dt:.1f} fps)")
elif mode == "b":
    np.asarray(sweep())[0, 0]  # warmup incl. D2H
    t0 = time.perf_counter()
    for _ in range(K):
        acc = sweep()
    v = np.asarray(acc)[0, 0]
    dt = time.perf_counter() - t0
    print(f"mode b: {dt/K*1e3:.1f} ms/sweep ({B*K/dt:.1f} fps)")
elif mode == "c":
    jax.block_until_ready(sweep())
    t0 = time.perf_counter()
    for _ in range(K):
        jax.block_until_ready(sweep())
    dt = time.perf_counter() - t0
    print(f"mode c (round-1 method): {dt/K*1e3:.1f} ms/sweep ({B*K/dt:.1f} fps)")
