"""Orientation assignment.

TPU-native rebuild of compute_orientations (src/sift.cpp:447-533).

The reference's per-keypoint dynamic radius ``round(3 * 1.5 * size)`` is
bounded because refined layers stay in [1, intervals] and |offset| < 0.5
(src/sift.cpp:405-410), so size_octave <= init_sigma * 2^((intervals+0.5)/intervals).
That static bound lets every keypoint gather a fixed (2R+3)^2 patch; the
dynamic radius and image-border skips become masks.  The 36-bin histogram is a
masked one-hot contraction (matmul-friendly), computed in keypoint chunks via
``lax.map`` to bound the one-hot intermediate.  The reference's *in-place*
sequential smoothing (src/sift.cpp:496-504, where updated bins feed later
ones) is reproduced exactly with an unrolled 36-step column update.

Fused path: ``orient_all`` processes a mixed-octave keypoint buffer in ONE
program — per-octave constants (2^-octave, image dims) become per-lane table
lookups, and patches come from a MultiRows layout of all octaves' gaussian
stacks (ops/gather.py) so the whole stage is one row-gather + MXU extraction
instead of 8 per-octave programs of vmapped dynamic_slice.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from sift_tpu.config import M_PI2, ORI_SMOOTH_ITERATIONS, SiftConfig
from sift_tpu.ops.gather import (
    MultiRows,
    build_multi_rows,
    gather_patches_multi,
    lut,
    with_row_units,
)
from sift_tpu.utils.keypoints import Keypoints
from sift_tpu.utils.numerics import round_half_away

# Keypoint-chunk size for histogram accumulation (memory/VMEM bound, not
# semantics).
ORI_CHUNK = 512


def max_size_octave(cfg: SiftConfig) -> float:
    """Upper bound on keypoint size in octave coordinates (see module doc)."""
    max_layer = cfg.intervals  # layers live in [border, depth-1-border] = [1, intervals]
    return cfg.init_sigma * math.pow(2, (max_layer + 0.5) / cfg.intervals)


def ori_radius_bound(cfg: SiftConfig) -> int:
    """Static bound for round(3 * ori_sigma_factor * size) (src/sift.cpp:463)."""
    return int(math.ceil(3.0 * cfg.ori_sigma_factor * max_size_octave(cfg) + 0.5))


def orient_all(
    mr: MultiRows,
    kp: Keypoints,
    cfg: SiftConfig,
    chunk: int = ORI_CHUNK,
    octave_of_volume: tuple[int, ...] | None = None,
    vol_sel: jnp.ndarray | None = None,
    n_octaves: int | None = None,
    dispatch_radius: bool = False,
    cand_slots: int | None = None,
) -> Keypoints:
    """Assign orientations to a mixed-octave keypoint buffer (one program).

    ``mr``: MultiRows layout of the per-octave gaussian stacks (unpadded;
    out-of-image columns read 0 via the block layout, out-of-image rows are
    clamped — both are masked below exactly like the reference's border skip,
    src/sift.cpp:473-479).  Keypoints are in initial (possibly doubled) image
    coordinates; outputs are in *input image* coordinates (halved when
    doubling, src/sift.cpp:522-526), one candidate per histogram bin with a
    validity mask (capacity N * num_bins); callers compact.

    ``vol_sel``/``n_octaves``/``dispatch_radius``: flattened-batch gather
    space and per-chunk window dispatch — same contracts as
    ``descriptor.compute_descriptors_all`` (see its docstring; in
    particular do NOT enable dispatch under vmap).

    ``cand_slots``: compress the per-keypoint candidate axis from num_bins
    (36) to this many slots before emitting, preserving bin order — the
    reference pushes one keypoint per accepted histogram peak
    (src/sift.cpp:506-518), and strict local maxima over 36 bins allow at
    most 18, with real images peaking at 3-4.  Downstream lane buffers
    (the batch un-permute gather, the per-image compact sort) shrink
    num_bins/C-fold while the valid candidate set and its relative order
    are untouched, so compact/dedup outputs are bit-identical.  Returns
    ``(Keypoints, max_peaks)`` in this mode; ``max_peaks`` (the largest
    per-keypoint peak count on valid lanes) exceeding ``cand_slots`` means
    real candidates were dropped — callers surface it through the same
    capacity-honesty counts as the other fixed buffers.
    """
    dtype = kp.x.dtype
    mr = with_row_units(mr)  # loop-invariant unit-gather view
    n = kp.capacity
    nb = cfg.num_bins
    octaves = n_octaves or len(mr.shapes)
    r_max = ori_radius_bound(cfg)

    oov = octave_of_volume or tuple(range(octaves))
    oct_sel = jnp.clip(kp.octave - oov[0], 0, octaves - 1)
    gsel = vol_sel if vol_sel is not None else oct_sel
    shapes = mr.shapes[:octaves]
    pow_denom = lut([1.0 / math.pow(2, o) for o in oov], oct_sel, dtype)
    x = round_half_away(kp.x * pow_denom).astype(jnp.int32)  # src/sift.cpp:458
    y = round_half_away(kp.y * pow_denom).astype(jnp.int32)
    size = kp.size * pow_denom
    scale = cfg.ori_sigma_factor * size
    radius = round_half_away(3.0 * scale).astype(jnp.int32)  # src/sift.cpp:463
    exp_denom = 2.0 * scale * scale

    width_l = lut([s[2] for s in shapes], oct_sel, jnp.int32)
    height_l = lut([s[1] for s in shapes], oct_sel, jnp.int32)
    layer_c = jnp.clip(kp.layer, 0, shapes[0][0] - 1)
    xc = jnp.clip(x, 0, width_l - 1)
    yc = jnp.clip(y, 0, height_l - 1)

    def make_hist_chunk(r: int, fast: bool = False):
        p = 2 * r + 3
        # Sample grid: i is the x offset, j the y offset (src/sift.cpp:472-483).
        ii = jnp.arange(-r, r + 1)
        ig = ii[None, :]  # (1, s) x offsets
        jg = ii[:, None]  # (s, 1) y offsets

        def hist_chunk(args):
            osel, lay, yy, xx, xo, yo, rad, edenom, wl, hl, vmask = args
            patches = gather_patches_multi(
                mr, osel, lay, yy - r - 1, xx - r - 1, p
            )
            dx = patches[:, 1:-1, 2:] - patches[:, 1:-1, :-2]
            dy = patches[:, :-2, 1:-1] - patches[:, 2:, 1:-1]
            magnitude = jnp.sqrt(dx * dx + dy * dy)
            angle = jnp.arctan2(dy, dx)
            if fast:
                # exp(-(i^2+j^2)/d) is SEPARABLE: 2*(2r+1) exp calls per
                # keypoint instead of (2r+1)^2 (ulp reorder covered by the
                # dispatch contract; pinned by test_fused_f32).
                g1 = jnp.exp(
                    -(ii * ii).astype(dtype)[None, :] / edenom[:, None]
                )  # (nc, 2r+1)
                w_exp = g1[:, :, None] * g1[:, None, :]
            else:
                w_exp = jnp.exp(
                    -(ig * ig + jg * jg).astype(dtype)[None] / edenom[:, None, None]
                )
            in_radius = (jnp.abs(ig) <= rad[:, None, None]) & (
                jnp.abs(jg) <= rad[:, None, None]
            )
            in_img = (
                (xo[:, None, None] + ig - 1 >= 0)
                & (xo[:, None, None] + ig + 1 <= wl[:, None, None] - 1)
                & (yo[:, None, None] + jg - 1 >= 0)
                & (yo[:, None, None] + jg + 1 <= hl[:, None, None] - 1)
            )
            mask = in_radius & in_img & vmask[:, None, None]
            h_idx = round_half_away(nb * (angle + math.pi) / M_PI2).astype(
                jnp.int32
            )
            h_idx = jnp.where(h_idx < nb, h_idx, 0)  # src/sift.cpp:490
            contrib = jnp.where(mask, w_exp * magnitude, jnp.asarray(0, dtype))
            onehot = (h_idx[..., None] == jnp.arange(nb)).astype(dtype)
            return jnp.einsum("nij,nijb->nb", contrib, onehot)

        return hist_chunk

    chunk = min(chunk, n)
    nchunk = -(-n // chunk)
    pad_n = nchunk * chunk - n

    if dispatch_radius:
        radii = [r for r in (11, 13) if r < r_max] + [r_max]
        thresholds = jnp.asarray(radii, jnp.int32)

        def zero_chunk(args):
            return jnp.zeros((args[1].shape[0], nb), dtype)

        branches = [zero_chunk] + [make_hist_chunk(r, fast=True) for r in radii]

        def run_chunk(args):
            rad, vmask = args[6], args[10]
            mx = jnp.max(jnp.where(vmask, rad, 0))
            cls = jnp.searchsorted(thresholds, mx).astype(jnp.int32)
            cls = jnp.where(jnp.any(vmask), cls + 1, 0)
            return jax.lax.switch(jnp.minimum(cls, len(radii)), branches, args)
    else:
        run_chunk = make_hist_chunk(r_max)

    def chunked(a):
        if pad_n:
            a = jnp.concatenate([a, jnp.zeros((pad_n,) + a.shape[1:], a.dtype)])
        return a.reshape((nchunk, chunk) + a.shape[1:])

    hist = jax.lax.map(
        run_chunk,
        (
            chunked(gsel), chunked(layer_c), chunked(yc), chunked(xc),
            chunked(x), chunked(y), chunked(radius), chunked(exp_denom),
            chunked(width_l), chunked(height_l), chunked(kp.valid),
        ),
    ).reshape(nchunk * chunk, nb)[:n]

    # In-place circular smoothing, twice (src/sift.cpp:496-504).  Bin-major
    # layout: updating column i of an (N, nb) buffer is a minor-dim scatter
    # (~4.7 ms/sweep measured); on the (nb, N) transpose each step is a
    # cheap whole-row dynamic-update.  Same sequential in-place recurrence
    # (h0 already smoothed, h2 not yet, exact wrap semantics), bit-equal.
    hist_t = hist.T
    for _ in range(ORI_SMOOTH_ITERATIONS):
        for i in range(nb):
            h0 = hist_t[(i - 1) % nb]
            h1 = hist_t[i]
            h2 = hist_t[(i + 1) % nb]
            hist_t = hist_t.at[i].set(0.25 * h0 + 0.5 * h1 + 0.25 * h2)
    hist = hist_t.T

    # Peak detection + parabolic interpolation (src/sift.cpp:506-518).
    max_peak = jnp.max(hist, axis=1)
    h0 = jnp.roll(hist, 1, axis=1)
    h2 = jnp.roll(hist, -1, axis=1)
    is_peak = (hist > h0) & (hist > h2) & (hist > cfg.peak_ratio * max_peak[:, None])

    bin_i = jnp.arange(nb, dtype=dtype)[None, :]
    denom = (h0 - 2 * hist) + h2
    denom_safe = jnp.where(denom == 0, jnp.asarray(1, dtype), denom)
    interp = bin_i + 0.5 * (h0 - h2) / denom_safe
    interp = jnp.fmod(interp + nb, float(nb))
    ori = M_PI2 * interp / nb
    ori = jnp.fmod(ori + M_PI2, M_PI2)

    halve = jnp.asarray(0.5 if cfg.double_image_size else 1.0, dtype)
    peak_valid = kp.valid[:, None] & is_peak  # (n, nb)

    slots = nb if cand_slots is None else cand_slots
    if cand_slots is not None:
        # Per-lane compression: take the first ``cand_slots`` peaks in bin
        # order (stable argsort on the masked bin index), so the flattened
        # (lane, slot) candidate order equals the (lane, bin) order on
        # valid lanes — compact/dedup see the identical sequence.
        counts = jnp.sum(peak_valid, axis=1, dtype=jnp.int32)
        max_peaks = jnp.max(jnp.where(kp.valid, counts, 0))
        bidx = jnp.arange(nb, dtype=jnp.int32)[None, :]
        order = jnp.argsort(
            jnp.where(peak_valid, bidx, nb), axis=1, stable=True
        )[:, :slots]
        ori = jnp.take_along_axis(ori, order, axis=1)
        peak_valid = (
            jnp.arange(slots, dtype=jnp.int32)[None, :] < counts[:, None]
        )

    cand_valid = peak_valid.reshape(-1)

    def rep(a):
        return jnp.repeat(a, slots, axis=0)

    out = Keypoints(
        x=rep(kp.x * halve),
        y=rep(kp.y * halve),
        octave=rep(kp.octave),
        layer=rep(kp.layer),
        size=rep(kp.size * halve),
        pori=ori.reshape(-1),
        desc=jnp.zeros((n * slots, 128), jnp.uint8),
        valid=cand_valid,
    )
    if cand_slots is not None:
        return out, max_peaks
    return out


def orient_octave_keypoints(
    gauss: jnp.ndarray, kp: Keypoints, octave: int, cfg: SiftConfig
) -> Keypoints:
    """Single-octave wrapper over orient_all (staged/debug path): the one
    gaussian stack is volume 0 with the true octave's 2^-octave table entry
    (kp.octave already equals ``octave`` on valid lanes)."""
    return orient_all(
        build_multi_rows([gauss]), kp, cfg, octave_of_volume=(octave,)
    )
