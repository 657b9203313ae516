"""Bisect the pyramid stage cost on the real chip (throwaway probe)."""
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
from sift_tpu.models.pyramid import build_pyramids, compute_initial_image
from sift_tpu.ops.pallas_pyramid import fused_octave_blur
from sift_tpu.config import gaussian_half_kernel
from sift_tpu.utils.io import load_image

cave = "/root/reference/stitching/collection/Dataset/CAVE-01_atrium"
img1 = load_image(f"{cave}/00.jpg")
img2 = load_image(f"{cave}/01.jpg")
B = 8
imgs = jnp.asarray(np.stack([img1, img2] * (B // 2)).astype(np.float32))
cfg = SiftConfig()
octaves = cfg.octaves_count(640 * 2, 480 * 2)


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
    print(f"{name:44s} {statistics.median(ts)*1e3:9.3f} ms")
    return fn()


init_fn = jax.jit(jax.vmap(lambda im: compute_initial_image(im, cfg)))
initial = timeit("initial image (gray+2x+blur)", lambda: init_fn(imgs))

pyr_fn = jax.jit(lambda x: build_pyramids(x, cfg, octaves), static_argnums=())
timeit("build_pyramids XLA (from initial)", lambda: pyr_fn(initial))

import dataclasses
cfg_pl = dataclasses.replace(cfg, use_pallas_pyramid=True)
pyr_pl = jax.jit(lambda x: build_pyramids(x, cfg_pl, octaves))
timeit("build_pyramids Pallas (from initial)", lambda: pyr_pl(initial))

# octave-0 only: 5 chained blurs + dogs, fused vs XLA
hks = [gaussian_half_kernel(s) for s in cfg.gaussian_kernels()]


@jax.jit
def oct0_fused(x):
    return fused_octave_blur(x, hks[1:])


from sift_tpu.ops.blur import separable_blur


@jax.jit
def oct0_xla(x):
    layers = [x]
    for i in range(1, len(hks)):
        layers.append(separable_blur(layers[-1], hks[i]))
    g = jnp.stack(layers, axis=-3)
    return g, g[..., 1:, :, :] - g[..., :-1, :, :]


timeit("octave-0 fused kernel only", lambda: oct0_fused(initial))
timeit("octave-0 XLA blurs+stack+dog", lambda: oct0_xla(initial))


# pure copy cost: stack 6 copies of initial
@jax.jit
def just_stack(x):
    return jnp.stack([x, x + 1, x + 2, x + 3, x + 4, x + 5], axis=-3)


timeit("stack 6x (8,960,1280) copies", lambda: just_stack(initial))

# grayscale+upsample only
gray_fn = jax.jit(jax.vmap(lambda im: jnp.mean(im, axis=-1)))
timeit("trivial gray (mean)", lambda: gray_fn(imgs))

from sift_tpu.ops.resize import upsample_bilinear
up_fn = jax.jit(jax.vmap(lambda im: upsample_bilinear(jnp.mean(im, -1), 2, 2)))
timeit("gray + 2x bilinear upsample", lambda: up_fn(imgs))
