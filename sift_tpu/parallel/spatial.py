"""Spatial (row-sharded) detection of ONE big image over the device mesh.

SURVEY.md section 2.7's "spatial/tile parallel" slot: the reference processes
one image on one core (src/main.cpp:14-15); here a single large frame is
sharded by rows over a mesh axis, each device computing the pyramid, extrema,
Newton refinement, orientations and descriptors for its row band on a local
HALO WINDOW, with XLA collectives carrying the inter-band dependencies:

  - every octave re-windows a replicated global seed (device-local slice);
    the next octave's seed is reassembled from the disjoint owned bands with
    a masked ``psum`` over the mesh axis (rides ICI);
  - final per-shard keypoint buffers merge with an ``all_gather`` and one
    global dedup (the same sort as clean_keypoints, src/sift.cpp:20-24).

Exactness: the halo is sized so that every consumer of off-band rows stays
inside valid data — the chained blurs consume ``sum_i radius_i`` rows of the
window margin (replicate padding at a window edge is only *semantically*
clamp at true image borders, where window edge == image edge by
construction), and the orientation/descriptor sample windows plus Newton
walks reach at most ``desc_radius_bound + 1`` rows beyond an owned band.
Windows are clamped inside the image (first/last shards place their band
off-center), so border masks coincide with the single-device ones.  Octaves
whose window would exceed the octave height fall back to replicated compute
with the same row-ownership masks (bands of small octaves are cheap).

Known deviations from the single-device pipeline, both beyond practical
reach: a Newton walker moving more than ``halo - chain`` rows off its band
reads decayed margin values / is bounds-rejected early, and the descriptor's
radius clamp to the image diagonal (src/sift.cpp:636-639) uses the window
diagonal (only active for images smaller than a descriptor window).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from sift_tpu.config import SiftConfig, gaussian_half_kernel
from sift_tpu.models.descriptor import compute_octave_descriptors, desc_radius_bound
from sift_tpu.models.detect import extremum_mask, refine_octave_keypoints
from sift_tpu.models.orient import orient_octave_keypoints
from sift_tpu.models.pyramid import compute_initial_image
from sift_tpu.ops.blur import separable_blur
from sift_tpu.ops.gather import compact_mask
from sift_tpu.ops.resize import downsample_nearest_x2
from sift_tpu.utils import keypoints as kputil
from sift_tpu.utils.keypoints import Keypoints


def spatial_halo(cfg: SiftConfig) -> int:
    """Rows of window margin needed on each side of an owned band."""
    hks = [gaussian_half_kernel(s) for s in cfg.gaussian_kernels()[1:]]
    chain = sum(len(hk) - 1 for hk in hks)
    reach = desc_radius_bound(cfg) + 1  # widest consumer of gaussian rows
    return -(-(chain + reach + 4) // 8) * 8


def _octave_dims(h2: int, w2: int, octaves: int) -> list[tuple[int, int]]:
    dims = []
    h, w = h2, w2
    for _ in range(octaves):
        dims.append((h, w))
        h, w = h // 2, w // 2
    return dims


def spatial_detect_and_describe(
    img: jnp.ndarray,
    cfg: SiftConfig,
    mesh: Mesh,
    axis: str = "data",
    max_octaves: int | None = None,
) -> Keypoints:
    """Detect+describe ONE (H, W[, C]) image with rows sharded over ``axis``.

    Returns a replicated global Keypoints buffer (capacity ``cfg.ori_cap``)
    equal to the staged single-device pipeline after dedup (see tests).

    ``max_octaves`` caps the pyramid depth (compared against a staged run
    with the same cap).  The per-octave unrolled pipeline costs ~2 min of
    XLA:CPU compile per octave on a small host, so compile-budgeted callers
    (the driver's multichip dryrun) cap the depth; production runs leave it
    None.
    """
    d = mesh.shape[axis]
    cfg = dataclasses.replace(
        cfg, use_pallas_blur=False, use_pallas_pyramid=False,
    )
    img = jnp.asarray(img, cfg.dtype)
    h_in, w_in = img.shape[0], img.shape[1]
    scale = 2 if cfg.double_image_size else 1
    octaves = cfg.octaves_count(w_in * scale, h_in * scale)
    if max_octaves is not None:
        octaves = min(octaves, max_octaves)
    dims = _octave_dims(h_in * scale, w_in * scale, octaves)
    halo = spatial_halo(cfg)
    kernels = cfg.gaussian_kernels()
    half_kernels = [gaussian_half_kernel(s) for s in kernels]
    n_layers = len(kernels)
    in_halve = 0.5 if cfg.double_image_size else 1.0

    @partial(
        shard_map, mesh=mesh, in_specs=(P(),), out_specs=P(), check_vma=False
    )
    def run(image):
        shard = jax.lax.axis_index(axis)
        seed = compute_initial_image(image, cfg)  # replicated global seed

        per_octave = []
        for o in range(octaves):
            h_o, w_o = dims[o]
            band = -(-h_o // d)
            win = min(band + 2 * halo, h_o)
            own_lo = jnp.minimum(shard * band, h_o)
            own_hi = jnp.minimum(own_lo + band, h_o)
            wstart = jnp.clip(own_lo - halo, 0, h_o - win)

            window = jax.lax.dynamic_slice(seed, (wstart, jnp.int32(0)), (win, w_o))
            layers = [window]
            for i in range(1, n_layers):
                layers.append(separable_blur(layers[-1], half_kernels[i]))
            g_loc = jnp.stack(layers, axis=0)
            dog_loc = g_loc[1:] - g_loc[:-1]

            # Extrema restricted to the owned band (each global extremum has
            # exactly one owner; matches detect_octave_extrema otherwise).
            b = cfg.window_size // 2
            mask = extremum_mask(dog_loc, cfg.extremum_threshold(), cfg.window_size)
            grow = (
                jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1) + b + wstart
            )
            mask = mask & (grow >= own_lo) & (grow < own_hi)
            cap_e = cfg.extrema_cap_for_octave(o)
            idx, valid = compact_mask(mask.reshape(-1), cap_e)
            d2, h2m, w2m = mask.shape
            z = idx // (h2m * w2m)
            y = (idx // w2m) % h2m
            x = idx % w2m
            zyx = jnp.stack([z + b, y + b, x + b], axis=-1).astype(jnp.int32)

            kp, off0 = refine_octave_keypoints(dog_loc, zyx, valid, o, cfg)
            kp, _ = kputil.compact(kp, cfg.kp_cap_for_octave(o), extra=off0)
            cand = orient_octave_keypoints(g_loc, kp, o, cfg)
            cand = kputil.compact(cand, 2 * cfg.kp_cap_for_octave(o))
            # Descriptors on LOCAL coordinates (consistent with g_loc), then
            # shift y to global input coords.  Dedup happens globally after
            # the merge with the identical clean_keypoints order, so the
            # per-duplicate representative (and its descriptor) matches the
            # single-device pipeline.
            desc = compute_octave_descriptors(g_loc, cand, o, cfg)
            y_shift = wstart.astype(cand.y.dtype) * (2.0**o * in_halve)
            cand = dataclasses.replace(
                cand, desc=desc,
                y=jnp.where(cand.valid, cand.y + y_shift, cand.y),
            )
            per_octave.append(cand)

            if o + 1 < octaves:
                # Rebuild the next octave's replicated global seed from the
                # disjoint owned bands: masked canvas + psum over the axis.
                src = g_loc[n_layers - 3]
                canvas = jnp.zeros((h_o, w_o), src.dtype)
                canvas = jax.lax.dynamic_update_slice(
                    canvas, src, (wstart, jnp.int32(0))
                )
                rows = jax.lax.broadcasted_iota(jnp.int32, canvas.shape, 0)
                canvas = jnp.where(
                    (rows >= own_lo) & (rows < own_hi), canvas, 0.0
                )
                canvas = jax.lax.psum(canvas, axis)
                seed = downsample_nearest_x2(canvas)

        local = kputil.concatenate(per_octave)
        return jax.tree.map(
            lambda a: jax.lax.all_gather(a, axis, axis=0, tiled=True), local
        )

    merged = run(img)
    return kputil.compact(kputil.sort_and_dedup(merged), cfg.ori_cap)
