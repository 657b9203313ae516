"""A/B the fused Newton refinement: MultiRows block width x two-phase split.

Times refine_keypoints_all on the real chip for blk in {32, 64, 128} with the
two-phase active-lane compaction on and off (off = refine_active_cap >= cap).
Drives the _REFINE_BLK / default refine_active_cap choices in detect.py.
"""

from __future__ import annotations

import dataclasses
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
from sift_tpu.models import detect as D
from sift_tpu.models import sift as S
from sift_tpu.models.detect import detect_extrema_all, refine_keypoints_all
from sift_tpu.utils.io import load_image

CAVE = "/root/reference/stitching/collection/Dataset/CAVE-01_atrium"


def fence(x):
    return np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[0])


def timeit(name, fn, reps=5, inner=4):
    fence(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn()
        fence(out)
        ts.append((time.perf_counter() - t0) / inner)
    print(f"{name:44s} median {sorted(ts)[len(ts)//2]*1e3:8.2f} ms", flush=True)


def main():
    cfg0 = SiftConfig(extrema_cap=6144, kp_cap=1536, ori_cap=2048)
    img1 = load_image(f"{CAVE}/00.jpg")
    img2 = load_image(f"{CAVE}/01.jpg")
    imgs = jnp.asarray(np.stack([img1, img2] * 4).astype(np.float32))
    octaves = cfg0.octaves_count(imgs.shape[2] * 2, imgs.shape[1] * 2)
    gaussians, dogs = S._jit_pyramids_batch(imgs, cfg0, octaves)
    thr = cfg0.extremum_threshold()

    @jax.jit
    def f_detect(dogs):
        return jax.vmap(
            lambda ds: detect_extrema_all(ds, thr, cfg0.extrema_cap,
                                          cfg0.window_size)
        )(dogs)

    oct_id, zyx, valid, _ = f_detect(dogs)
    jax.block_until_ready(zyx)

    for blk in (32, 64, 128):
        for two_phase in (False, True):
            D._REFINE_BLK = blk
            cfg = (cfg0 if two_phase
                   else dataclasses.replace(cfg0, refine_active_cap=1 << 30))

            @jax.jit
            def f_refine(dogs, oct_id, zyx, valid, cfg=cfg):
                return jax.vmap(
                    lambda ds, o, z, v: refine_keypoints_all(ds, o, z, v, cfg)
                )(dogs, oct_id, zyx, valid)

            timeit(f"refine blk={blk} two_phase={two_phase}",
                   lambda f=f_refine: f(dogs, oct_id, zyx, valid))


if __name__ == "__main__":
    main()
