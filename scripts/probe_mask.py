"""A/B extremum-mask formulations on the real chip."""
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
from sift_tpu.models.detect import extremum_mask
from sift_tpu.utils.io import load_image

cave = "/root/reference/stitching/collection/Dataset/CAVE-01_atrium"
img1 = load_image(f"{cave}/00.jpg")
img2 = load_image(f"{cave}/01.jpg")
B = 8
imgs = jnp.asarray(np.stack([img1, img2] * (B // 2)).astype(np.float32))
cfg = SiftConfig()
octaves = cfg.octaves_count(640 * 2, 480 * 2)
thr = cfg.extremum_threshold()


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


gaussians, dogs = S._jit_pyramids_batch(imgs, cfg, octaves)
fence(dogs)


@jax.jit
def masks_cur(dogs):
    return [jax.vmap(lambda d: extremum_mask(d, thr, 3))(d) for d in dogs]


timeit("current (interior slice chains)", lambda: masks_cur(dogs))


def mask_padded(d, thr):
    # d: (D, H, W). Same-shape shifted max/min via edge pads; interior mask.
    D, H, W = d.shape

    def shifts(x, axis, fill):
        pad = [(0, 0)] * 3
        pad[axis] = (1, 1)
        p = jnp.pad(x, pad, constant_values=fill)
        L = x.shape[axis]
        sl_lo = [slice(None)] * 3
        sl_hi = [slice(None)] * 3
        sl_lo[axis] = slice(0, L)
        sl_hi[axis] = slice(2, L + 2)
        return p[tuple(sl_lo)], p[tuple(sl_hi)]

    wmax = d
    wmin = d
    for ax in (2, 1, 0):
        lo, hi = shifts(wmax, ax, -jnp.inf)
        wmax = jnp.maximum(wmax, jnp.maximum(lo, hi))
        lo, hi = shifts(wmin, ax, jnp.inf)
        wmin = jnp.minimum(wmin, jnp.minimum(lo, hi))
    ii = jax.lax.broadcasted_iota
    interior = (
        (ii(jnp.int32, d.shape, 0) >= 1) & (ii(jnp.int32, d.shape, 0) < D - 1)
        & (ii(jnp.int32, d.shape, 1) >= 1) & (ii(jnp.int32, d.shape, 1) < H - 1)
        & (ii(jnp.int32, d.shape, 2) >= 1) & (ii(jnp.int32, d.shape, 2) < W - 1)
    )
    # Note >= / <= against the 27-window INCLUDING center is equivalent to
    # the reference's neighbor test (center vs itself is always ==).
    m = (jnp.abs(d) > thr) & ((d >= wmax) | (d <= wmin)) & interior
    return m[1:-1, 1:-1, 1:-1]


@jax.jit
def masks_pad(dogs):
    return [jax.vmap(lambda d: mask_padded(d, thr))(d) for d in dogs]


timeit("padded same-shape rolls", lambda: masks_pad(dogs))

# correctness cross-check
a = masks_cur(dogs)
bm = masks_pad(dogs)
for x, y in zip(a, bm):
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
print("masks identical")


# reduce_window variant for reference
@jax.jit
def masks_rw(dogs):
    outs = []
    for d in dogs:
        wmax = jax.lax.reduce_window(
            d, -jnp.inf, jax.lax.max, (1, 3, 3, 3), (1, 1, 1, 1), "VALID"
        )
        wmin = jax.lax.reduce_window(
            d, jnp.inf, jax.lax.min, (1, 3, 3, 3), (1, 1, 1, 1), "VALID"
        )
        c = d[:, 1:-1, 1:-1, 1:-1]
        outs.append((jnp.abs(c) > thr) & ((c >= wmax) | (c <= wmin)))
    return outs


timeit("reduce_window VALID", lambda: masks_rw(dogs))
