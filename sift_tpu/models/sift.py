"""End-to-end SIFT pipeline orchestrator.

TPU-native rebuild of detect_keypoints_and_descriptors (src/sift.cpp:712-776),
minus the reference's design warts: no PNG side effect inside the detection
API (src/sift.cpp:766-768), no stdout logging interleaved with compute, no
per-extremum deep copies.

The whole pipeline for one image size compiles to a single XLA program: the
octave loop is unrolled at trace time, every stage runs on fixed-capacity
buffers, and compiled programs are cached per (shape, config).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sift_tpu.config import SiftConfig
from sift_tpu.models.descriptor import compute_octave_descriptors
from sift_tpu.models.detect import detect_octave_extrema, refine_octave_keypoints
from sift_tpu.models.orient import orient_octave_keypoints
from sift_tpu.models.pyramid import build_pyramids, compute_initial_image
from sift_tpu.utils import keypoints as kputil
from sift_tpu.utils.keypoints import Keypoints


def detect_fn(img: jnp.ndarray, cfg: SiftConfig, octaves: int) -> Keypoints:
    """Traceable detect+describe for a fixed image shape. img: (H, W[, C])."""
    initial = compute_initial_image(img, cfg)
    gaussians, dogs = build_pyramids(initial, cfg, octaves)
    threshold = cfg.extremum_threshold()

    oriented: list[Keypoints] = []
    for o in range(octaves):
        zyx, valid = detect_octave_extrema(
            dogs[o], threshold, cfg.extrema_cap_for_octave(o), cfg.window_size
        )
        kp = refine_octave_keypoints(dogs[o], zyx, valid, o, cfg)
        kp = kputil.compact(kp, cfg.kp_cap_for_octave(o))
        cand = orient_octave_keypoints(gaussians[o], kp, o, cfg)
        oriented.append(kputil.compact(cand, 2 * cfg.kp_cap_for_octave(o)))

    allkp = kputil.concatenate(oriented)
    allkp = kputil.sort_and_dedup(allkp)

    # Descriptors per octave: select this octave's lanes, compute, scatter back.
    n = allkp.capacity
    desc_all = allkp.desc
    for o in range(octaves):
        sel = allkp.valid & (allkp.octave == o)
        cap_o = 2 * cfg.kp_cap_for_octave(o)
        idx = jnp.nonzero(sel, size=cap_o, fill_value=n)[0]
        in_range = idx < n
        idx_c = jnp.minimum(idx, n - 1)
        sub = jax.tree.map(lambda a: jnp.take(a, idx_c, axis=0), allkp)
        sub = dataclasses.replace(sub, valid=sub.valid & in_range)
        desc = compute_octave_descriptors(gaussians[o], sub, o, cfg)
        desc_all = desc_all.at[idx].set(desc, mode="drop")

    return dataclasses.replace(allkp, desc=desc_all)


@partial(jax.jit, static_argnums=(1, 2))
def _detect_jit(img, cfg: SiftConfig, octaves: int) -> Keypoints:
    return detect_fn(img, cfg, octaves)


def detect_and_describe(image, cfg: SiftConfig | None = None) -> Keypoints:
    """Detect SIFT keypoints + descriptors for one image.

    ``image``: (H, W) or (H, W, C) array in [0, 255] (float or uint8).
    Returns a fixed-capacity Keypoints buffer (device arrays) with a validity
    mask; ``.to_numpy()`` gives the dense host view.
    """
    cfg = cfg or SiftConfig()
    img = jnp.asarray(image, cfg.dtype)
    h, w = img.shape[0], img.shape[1]
    scale = 2 if cfg.double_image_size else 1
    octaves = cfg.octaves_count(w * scale, h * scale)
    return _detect_jit(img, cfg, octaves)
