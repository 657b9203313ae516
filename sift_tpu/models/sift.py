"""End-to-end SIFT pipeline orchestrator.

TPU-native rebuild of detect_keypoints_and_descriptors (src/sift.cpp:712-776),
minus the reference's design warts: no PNG side effect inside the detection
API (src/sift.cpp:766-768), no stdout logging interleaved with compute, no
per-extremum deep copies.

Execution model: every stage runs on fixed-capacity buffers with the octave
loop unrolled at trace time.  Production entry points run stage-wise (one
persistently-cached XLA program per stage/octave, optionally vmapped over an
image batch); ``detect_fn`` traces the whole pipeline into one program for
composition under vmap/shard_map (multi-chip) — the fully fused program is
kept out of the hot path because XLA compiles it superlinearly slower.
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
from sift_tpu.ops.gather import compact_mask
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
        kp, _ = refine_octave_keypoints(dogs[o], zyx, valid, o, cfg)
        kp = kputil.compact(kp, cfg.kp_cap_for_octave(o))
        cand = orient_octave_keypoints(gaussians[o], kp, o, cfg)
        oriented.append(kputil.compact(cand, 2 * cfg.kp_cap_for_octave(o)))

    allkp = kputil.concatenate(oriented)
    allkp = kputil.sort_and_dedup(allkp)
    # Pack into the final ori_cap buffer: downstream matching cost scales
    # with capacity, not keypoint count.
    allkp = kputil.compact(allkp, cfg.ori_cap)

    # Descriptors per octave: select this octave's lanes, compute, scatter back.
    n = allkp.capacity
    desc_all = allkp.desc
    for o in range(octaves):
        sel = allkp.valid & (allkp.octave == o)
        cap_o = 2 * cfg.kp_cap_for_octave(o)
        idx_c, in_range = compact_mask(sel, cap_o)
        idx = jnp.where(in_range, idx_c, n)
        sub = jax.tree.map(lambda a: jnp.take(a, idx_c, axis=0), allkp)
        sub = dataclasses.replace(sub, valid=sub.valid & in_range)
        desc = compute_octave_descriptors(gaussians[o], sub, o, cfg)
        desc_all = desc_all.at[idx].set(desc, mode="drop")

    return dataclasses.replace(allkp, desc=desc_all)


@partial(jax.jit, static_argnums=(1, 2))
def _detect_jit(img, cfg: SiftConfig, octaves: int) -> Keypoints:
    return detect_fn(img, cfg, octaves)


@partial(jax.jit, static_argnums=(2, 3))
def _jit_octave_pipeline(dog, gauss, cfg: SiftConfig, octave: int):
    """extrema -> refine -> orient for one octave (one compiled program)."""
    zyx, valid = detect_octave_extrema(
        dog, cfg.extremum_threshold(), cfg.extrema_cap_for_octave(octave),
        cfg.window_size,
    )
    kp, _ = refine_octave_keypoints(dog, zyx, valid, octave, cfg)
    kp = kputil.compact(kp, cfg.kp_cap_for_octave(octave))
    cand = orient_octave_keypoints(gauss, kp, octave, cfg)
    return kputil.compact(cand, 2 * cfg.kp_cap_for_octave(octave))


# --- batched (leading image axis) stage-wise path: same per-stage programs
# vmapped over a batch, which amortizes per-dispatch host overhead and fills
# the chip; used by the throughput benchmark and data-parallel sharding ---


@partial(jax.jit, static_argnums=(1, 2))
def _jit_pyramids_batch(imgs, cfg: SiftConfig, octaves: int):
    return jax.vmap(
        lambda im: build_pyramids(compute_initial_image(im, cfg), cfg, octaves)
    )(imgs)


@partial(jax.jit, static_argnums=(2, 3))
def _jit_octave_pipeline_batch(dog, gauss, cfg: SiftConfig, octave: int):
    def one(d, g):
        zyx, valid = detect_octave_extrema(
            d, cfg.extremum_threshold(), cfg.extrema_cap_for_octave(octave),
            cfg.window_size,
        )
        kp, _ = refine_octave_keypoints(d, zyx, valid, octave, cfg)
        kp = kputil.compact(kp, cfg.kp_cap_for_octave(octave))
        cand = orient_octave_keypoints(g, kp, octave, cfg)
        return kputil.compact(cand, 2 * cfg.kp_cap_for_octave(octave))

    return jax.vmap(one)(dog, gauss)


@partial(jax.jit)
def _jit_dedup_batch(allkp):
    return jax.vmap(kputil.sort_and_dedup)(allkp)


@partial(jax.jit, static_argnums=(1,))
def _jit_compact_batch(allkp, cap: int):
    return jax.vmap(lambda kp: kputil.compact(kp, cap))(allkp)


@partial(jax.jit, static_argnums=(2, 3))
def _jit_octave_descriptors_batch(gauss, allkp, cfg: SiftConfig, octave: int):
    def one(g, kp):
        n = kp.capacity
        sel = kp.valid & (kp.octave == octave)
        cap_o = 2 * cfg.kp_cap_for_octave(octave)
        idx_c, in_range = compact_mask(sel, cap_o)
        idx = jnp.where(in_range, idx_c, n)
        sub = jax.tree.map(lambda a: jnp.take(a, idx_c, axis=0), kp)
        sub = dataclasses.replace(sub, valid=sub.valid & in_range)
        desc = compute_octave_descriptors(g, sub, octave, cfg)
        return kp.desc.at[idx].set(desc, mode="drop")

    return jax.vmap(one)(gauss, allkp)


def detect_and_describe_batch(images, cfg: SiftConfig | None = None) -> Keypoints:
    """Batched detect+describe: (B, H, W[, C]) -> Keypoints with leading B.

    Same stage-wise execution as detect_and_describe, vmapped over the batch.
    """
    cfg = cfg or SiftConfig()
    imgs = jnp.asarray(images, cfg.dtype)
    h, w = imgs.shape[1], imgs.shape[2]
    scale = 2 if cfg.double_image_size else 1
    octaves = cfg.octaves_count(w * scale, h * scale)

    gaussians, dogs = _jit_pyramids_batch(imgs, cfg, octaves)
    oriented = [
        _jit_octave_pipeline_batch(dogs[o], gaussians[o], cfg, o)
        for o in range(octaves)
    ]
    allkp = _jit_dedup_batch(
        jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=1), *oriented)
    )
    allkp = _jit_compact_batch(allkp, cfg.ori_cap)
    desc_all = allkp.desc
    for o in range(octaves):
        desc_all = _jit_octave_descriptors_batch(
            gaussians[o], dataclasses.replace(allkp, desc=desc_all), cfg, o
        )
    return dataclasses.replace(allkp, desc=desc_all)


# --- per-stage jitted helpers (compiled + persistently cached separately,
# so tests and debugging don't pay for one huge fused compile) ---


@partial(jax.jit, static_argnums=(1, 2))
def _jit_pyramids(img, cfg: SiftConfig, octaves: int):
    initial = compute_initial_image(img, cfg)
    gaussians, dogs = build_pyramids(initial, cfg, octaves)
    return initial, gaussians, dogs


@partial(jax.jit, static_argnums=(1, 2))
def _jit_octave_extrema(dog, cfg: SiftConfig, octave: int):
    return detect_octave_extrema(
        dog, cfg.extremum_threshold(), cfg.extrema_cap_for_octave(octave),
        cfg.window_size,
    )


@partial(jax.jit, static_argnums=(3, 4))
def _jit_octave_refine(dog, zyx, valid, cfg: SiftConfig, octave: int):
    kp, off0 = refine_octave_keypoints(dog, zyx, valid, octave, cfg)
    return kputil.compact(kp, cfg.kp_cap_for_octave(octave), extra=off0)


@partial(jax.jit, static_argnums=(2, 3))
def _jit_octave_orient(gauss, kp, cfg: SiftConfig, octave: int):
    cand = orient_octave_keypoints(gauss, kp, octave, cfg)
    return kputil.compact(cand, 2 * cfg.kp_cap_for_octave(octave))


@partial(jax.jit, static_argnums=(1,))
def _jit_dedup(allkp, ori_cap: int):
    return kputil.compact(kputil.sort_and_dedup(allkp), ori_cap)


@partial(jax.jit, static_argnums=(2, 3))
def _jit_octave_descriptors(gauss, allkp, cfg: SiftConfig, octave: int):
    n = allkp.capacity
    sel = allkp.valid & (allkp.octave == octave)
    cap_o = 2 * cfg.kp_cap_for_octave(octave)
    idx_c, in_range = compact_mask(sel, cap_o)
    idx = jnp.where(in_range, idx_c, n)
    sub = jax.tree.map(lambda a: jnp.take(a, idx_c, axis=0), allkp)
    sub = dataclasses.replace(sub, valid=sub.valid & in_range)
    desc = compute_octave_descriptors(gauss, sub, octave, cfg)
    return allkp.desc.at[idx].set(desc, mode="drop")


def _host_exact_sizes(kp: Keypoints, off0, octave: int, cfg: SiftConfig) -> Keypoints:
    """Recompute kp.size with glibc pow for bit-parity (src/sift.cpp:427-429).

    XLA's exp2 deviates from glibc pow(2, x) by 1 ulp on ~30% of inputs; the
    f64 parity profile fixes sizes on the host.  Identical math otherwise.
    """
    import math

    from sift_tpu.utils.native import pow2_glibc

    size = np.asarray(kp.size).copy()
    layer = np.asarray(kp.layer).astype(np.float64)
    off = np.asarray(off0).astype(np.float64)
    valid = np.asarray(kp.valid)
    scale = cfg.init_sigma * math.pow(2, octave)
    t = (layer + off) / float(cfg.intervals)
    p = pow2_glibc(t)  # vectorized libm pow(2, .), bit-equal to math.pow
    if p is not None:
        size = np.where(valid, scale * p, size)
    else:
        for i in np.nonzero(valid)[0]:
            size[i] = scale * math.pow(2, float(t[i]))
    return dataclasses.replace(kp, size=jnp.asarray(size))


def detect_stages(img, cfg: SiftConfig, octaves: int) -> dict:
    """Debug/parity view: every pipeline stage for one image.

    Runs stage-by-stage through individually jitted (and persistently cached)
    helpers.  Mirrors the stage boundaries of src/sift.cpp:712-776.
    """
    initial, gaussians, dogs = _jit_pyramids(img, cfg, octaves)
    out = dict(initial=initial, gaussians=gaussians, dogs=dogs,
               extrema=[], refined=[], oriented=[])
    parity = jnp.dtype(cfg.dtype) == jnp.float64
    for o in range(octaves):
        zyx, valid = _jit_octave_extrema(dogs[o], cfg, o)
        out["extrema"].append((zyx, valid))
        kp, off0 = _jit_octave_refine(dogs[o], zyx, valid, cfg, o)
        if parity:
            kp = _host_exact_sizes(kp, off0, o, cfg)
        out["refined"].append(kp)
        out["oriented"].append(_jit_octave_orient(gaussians[o], kp, cfg, o))
    allkp = _jit_dedup(kputil.concatenate(out["oriented"]), cfg.ori_cap)
    desc_all = allkp.desc
    for o in range(octaves):
        desc_all = _jit_octave_descriptors(
            gaussians[o], dataclasses.replace(allkp, desc=desc_all), cfg, o
        )
    out["final"] = dataclasses.replace(allkp, desc=desc_all)
    return out


def detect_and_describe(image, cfg: SiftConfig | None = None) -> Keypoints:
    """Detect SIFT keypoints + descriptors for one image.

    ``image``: (H, W) or (H, W, C) array in [0, 255] (float or uint8).
    Returns a fixed-capacity Keypoints buffer (device arrays) with a validity
    mask; ``.to_numpy()`` gives the dense host view.

    Execution is stage-wise (one compiled program per pipeline stage /
    octave): XLA compile time explodes superlinearly on the fully fused
    8-octave graph, while per-stage programs compile in seconds and are
    persistently cached.  Dispatch is async, so stages pipeline back-to-back
    on device; use ``detect_fn`` directly to trace the whole pipeline into a
    larger program (e.g. inside vmap/shard_map for multi-chip runs).
    """
    cfg = cfg or SiftConfig()
    img = jnp.asarray(image, cfg.dtype)
    h, w = img.shape[0], img.shape[1]
    scale = 2 if cfg.double_image_size else 1
    octaves = cfg.octaves_count(w * scale, h * scale)

    initial, gaussians, dogs = _jit_pyramids(img, cfg, octaves)
    oriented = [
        _jit_octave_pipeline(dogs[o], gaussians[o], cfg, o)
        for o in range(octaves)
    ]
    allkp = _jit_dedup(kputil.concatenate(oriented), cfg.ori_cap)
    desc_all = allkp.desc
    for o in range(octaves):
        desc_all = _jit_octave_descriptors(
            gaussians[o], dataclasses.replace(allkp, desc=desc_all), cfg, o
        )
    return dataclasses.replace(allkp, desc=desc_all)
