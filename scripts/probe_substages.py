"""Sub-stage timing probe for the fused pipeline on the real chip.

Breaks detect+refine / orientation / descriptors into their component ops
(mask, compaction, cube gathers, patch gathers, histogram math) and times
each with the D2H fence, for both the default and a tight capacity profile.
Drives the capacity/bucketing optimization work; results land in PERF.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sift_tpu import SiftConfig
from sift_tpu.models import sift as S
from sift_tpu.models.descriptor import compute_descriptors_all, desc_radius_bound
from sift_tpu.models.detect import (
    detect_extrema_all,
    extremum_mask,
    refine_keypoints_all,
)
from sift_tpu.models.orient import orient_all, ori_radius_bound
from sift_tpu.ops.gather import build_multi_rows, compact_mask, gather_patches_multi
from sift_tpu.utils.io import load_image

CAVE = "/root/reference/stitching/collection/Dataset/CAVE-01_atrium"


def fence(x):
    leaves = jax.tree.leaves(x)
    return np.asarray(jnp.ravel(leaves[0])[0])


def timeit(name, fn, reps=5, inner=4):
    fence(fn())  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn()
        fence(out)
        ts.append((time.perf_counter() - t0) / inner)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:44s} median {med*1e3:8.2f} ms", flush=True)
    return fn()


def run(cfg: SiftConfig, tag: str, B: int = 8):
    img1 = load_image(f"{CAVE}/00.jpg")
    img2 = load_image(f"{CAVE}/01.jpg")
    imgs = jnp.asarray(np.stack([img1, img2] * (B // 2)).astype(np.float32))
    octaves = cfg.octaves_count(imgs.shape[2] * 2, imgs.shape[1] * 2)
    print(f"--- {tag}: extrema={cfg.extrema_cap} kp={cfg.kp_cap} "
          f"ori={cfg.ori_cap} batch={B} ---")

    gaussians, dogs = S._jit_pyramids_batch(imgs, cfg, octaves)
    jax.block_until_ready(gaussians[0])

    thr = cfg.extremum_threshold()

    @jax.jit
    def f_masks(dogs):
        return [jax.vmap(lambda d: extremum_mask(d, thr, cfg.window_size))(d)
                for d in dogs]

    timeit("extremum masks (all octaves)", lambda: f_masks(dogs))

    @jax.jit
    def f_detect(dogs):
        return jax.vmap(
            lambda ds: detect_extrema_all(ds, thr, cfg.extrema_cap,
                                          cfg.window_size)
        )(dogs)

    oct_id, zyx, valid, _tot = timeit(
        "masks + global compaction", lambda: f_detect(dogs))

    @jax.jit
    def f_refine(dogs, oct_id, zyx, valid):
        return jax.vmap(
            lambda ds, o, z, v: refine_keypoints_all(ds, o, z, v, cfg)
        )(dogs, oct_id, zyx, valid)

    kp, _off, _na = timeit("newton refine (5 steps)",
                           lambda: f_refine(dogs, oct_id, zyx, valid))

    import sift_tpu.utils.keypoints as kputil

    @jax.jit
    def f_compact(kp):
        return jax.vmap(lambda k: kputil.compact(k, cfg.kp_cap))(kp)

    kpc = timeit("compact to kp_cap", lambda: f_compact(kp))

    mr = timeit("gauss MultiRows relayout",
                lambda: S._jit_gauss_rows_batch(gaussians))

    r_ori = ori_radius_bound(cfg)
    p_ori = 2 * r_ori + 3

    @jax.jit
    def f_ori_gather(mr, kpc):
        def one(m, k):
            x = jnp.clip(k.x.astype(jnp.int32), 0, 10000)
            y = jnp.clip(k.y.astype(jnp.int32), 0, 10000)
            lay = jnp.clip(k.layer, 0, 5)
            return gather_patches_multi(
                m, jnp.clip(k.octave, 0, octaves - 1), lay,
                y - r_ori - 1, x - r_ori - 1, p_ori,
            ).sum()
        return jax.vmap(one)(mr, kpc)

    timeit(f"ori patch gather only ({p_ori}x{p_ori})",
           lambda: f_ori_gather(mr, kpc))

    cand = timeit("orientation full",
                  lambda: S._jit_orient_batch(mr, kpc, cfg)[0])
    allkp = timeit("dedup + compact",
                   lambda: S._jit_dedup_compact_batch(cand, cfg.ori_cap))

    r_desc = desc_radius_bound(cfg)
    p_desc = 2 * r_desc + 3

    @jax.jit
    def f_desc_gather(mr, allkp):
        def one(m, k):
            x = jnp.clip(k.x.astype(jnp.int32), 0, 10000)
            y = jnp.clip(k.y.astype(jnp.int32), 0, 10000)
            lay = jnp.clip(k.layer, 0, 5)
            return gather_patches_multi(
                m, jnp.clip(k.octave, 0, octaves - 1), lay,
                y - r_desc - 1, x - r_desc - 1, p_desc,
            ).sum()
        return jax.vmap(one)(mr, allkp)

    timeit(f"desc patch gather only ({p_desc}x{p_desc})",
           lambda: f_desc_gather(mr, allkp))

    timeit("descriptors full", lambda: S._jit_desc_all_batch(mr, allkp, cfg))
    print()


if __name__ == "__main__":
    if "--tight-only" not in sys.argv:
        run(SiftConfig(), "default caps")
    run(
        SiftConfig(extrema_cap=6144, kp_cap=1536, ori_cap=2048),
        "tight caps (640x480 CAVE workload)",
    )
