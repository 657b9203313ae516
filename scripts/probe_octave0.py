"""Fine-grained timing of octave-0 pipeline sub-stages on the real chip."""
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
from sift_tpu.models.detect import detect_octave_extrema, refine_octave_keypoints
from sift_tpu.models.orient import orient_octave_keypoints, ori_radius_bound
from sift_tpu.ops.gather import build_multi_rows, gather_patches_multi
from sift_tpu.utils import keypoints as kputil
from sift_tpu.utils.io import load_image

cave = "/root/reference/stitching/collection/Dataset/CAVE-01_atrium"
img1 = load_image(f"{cave}/00.jpg")
img2 = load_image(f"{cave}/01.jpg")
cfg = SiftConfig()
B = 8
imgs = jnp.asarray(np.stack([img1, img2] * (B // 2)).astype(np.float32))
octaves = cfg.octaves_count(1280, 960)
gaussians, dogs = S._jit_pyramids_batch(imgs, cfg, octaves)
dog0, gauss0 = dogs[0], gaussians[0]
print("dog0", dog0.shape, "gauss0", gauss0.shape)


def fence(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def timeit(name, fn, reps=5, k=4):
    fence(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn()
        fence(out)
        ts.append((time.perf_counter() - t0) / k)
    print(f"{name:42s} {statistics.median(ts)*1e3:9.2f} ms")
    return fn()


o = 0
thr = cfg.extremum_threshold()
ecap = cfg.extrema_cap_for_octave(o)
kcap = cfg.kp_cap_for_octave(o)

f_ext = jax.jit(jax.vmap(lambda d: detect_octave_extrema(d, thr, ecap, cfg.window_size)))
ext = timeit("extrema detect", lambda: f_ext(dog0))

f_ref = jax.jit(jax.vmap(lambda d, z, v: refine_octave_keypoints(d, z, v, o, cfg)[0]))
kp = timeit("refine (5 newton steps)", lambda: f_ref(dog0, ext[0], ext[1]))

f_cmp = jax.jit(jax.vmap(lambda k: kputil.compact(k, kcap)))
kpc = timeit("compact to kp_cap", lambda: f_cmp(kp))

f_ori = jax.jit(jax.vmap(lambda g, k: orient_octave_keypoints(g, k, o, cfg)))
timeit("orient full", lambda: f_ori(gauss0, kpc))

# orient sub-parts on one image
r_max = ori_radius_bound(cfg)
g1 = gauss0[0]
k1 = jax.tree.map(lambda a: a[0], kpc)
import math

from sift_tpu.utils.numerics import round_half_away

pow_denom = 1.0
x = jnp.clip(round_half_away(k1.x * pow_denom).astype(jnp.int32), 0, g1.shape[-1] - 1)
y = jnp.clip(round_half_away(k1.y * pow_denom).astype(jnp.int32), 0, g1.shape[-2] - 1)
lay = jnp.clip(k1.layer, 0, g1.shape[0] - 1)

f_mr = jax.jit(lambda g: build_multi_rows([g]))
mr1 = timeit("rows build (1 img)", lambda: f_mr(g1))
f_gat = jax.jit(
    lambda m, l, yy, xx: gather_patches_multi(
        m, jnp.zeros_like(l), l, yy - r_max - 1, xx - r_max - 1, 2 * r_max + 3
    )
)
timeit("patch gather 4096x37x37 (1 img)", lambda: f_gat(mr1, lay, y, x))
