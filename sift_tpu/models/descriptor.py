"""128-D gradient-histogram descriptors.

TPU-native rebuild of compute_descriptors / update_histogram /
convert_hist_to_desc (src/sift.cpp:541-682).

The reference's per-keypoint rotated sample loop with scatter-add trilinear
binning is reformulated as a 3-way one-hot contraction so it runs on the MXU:
for every sample we build 2-sparse one-hot factors along the row, column and
orientation bin axes (boundary bins dropped, orientation wraps mod 8 like
src/sift.cpp:563), take the row x col outer product, and contract against the
orientation factor — hist[r, c, o] = sum_s R[s, r] * C[s, c] * O[s, o].  The
per-contribution multiply chain keeps the reference order
((magnitude * f_r) * f_c) * f_o.  Keypoints are processed in ``lax.map``
chunks to bound the (chunk, S^2, 16) intermediate.

Fused path: ``compute_descriptors_all`` handles a mixed-octave buffer in ONE
program (per-lane 2^-octave / image-dim tables + MultiRows patch gathers),
replacing 8 per-octave select+compute+scatter programs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from sift_tpu.config import (
    DESC_HIST_BINS,
    DESC_HIST_WIDTH,
    DESC_MAGNITUDE_THR,
    INT_DESCR_FCTR,
    M_PI2,
    SiftConfig,
)
from sift_tpu.models.orient import max_size_octave
from sift_tpu.ops.gather import (
    MultiRows,
    build_multi_rows,
    gather_patches_multi,
    lut,
    with_row_units,
)
from sift_tpu.utils.keypoints import Keypoints
from sift_tpu.utils.numerics import round_half_away

DESC_CHUNK = 256


def desc_radius_bound(cfg: SiftConfig) -> int:
    """Static bound for the descriptor radius (src/sift.cpp:636-639)."""
    hw = cfg.desc_scale_factor * max_size_octave(cfg)
    return int(math.ceil(hw * 0.5 * math.sqrt(2.0) * (DESC_HIST_WIDTH + 1.0) + 1.0))


def compute_descriptors_all(
    mr: MultiRows,
    kp: Keypoints,
    cfg: SiftConfig,
    chunk: int = DESC_CHUNK,
    octave_of_volume: tuple[int, ...] | None = None,
    vol_sel: jnp.ndarray | None = None,
    n_octaves: int | None = None,
    dispatch_radius: bool = False,
) -> jnp.ndarray:
    """Descriptors for a mixed-octave keypoint buffer: (N, 128) uint8.

    ``kp`` holds post-dedup keypoints in input-image coords; ``mr`` is the
    MultiRows layout of the per-octave gaussian stacks (unpadded — column
    zero-fill and row clamping are masked exactly like the reference's border
    test at src/sift.cpp:655-660).

    ``vol_sel``/``n_octaves``: when ``mr`` concatenates several images'
    octave stacks (the flattened batch path), ``vol_sel`` gives each lane's
    volume index (img * n_octaves + octave) and ``n_octaves`` the per-image
    octave count (per-octave tables repeat across images).

    ``dispatch_radius``: per-chunk window-size dispatch.  The sample window
    is statically sized for the worst-case radius (r_max = 40 at default
    config) but per-keypoint radii span [20, 39] by layer, and compacted
    buffers leave whole chunks invalid; with buffers sorted by size
    (sort_and_dedup), each lax.map chunk branches (lax.switch) to the
    smallest of {empty, r<=24, r<=32, r_max} windows that covers its max
    radius.  Shrinking the window only drops exact-zero contributions, but
    the einsum reduction order over samples changes, so f32 descriptors may
    differ in the last ulp vs the monolithic window — do NOT enable on the
    f64 parity path (it keeps byte parity only because f64 slack absorbs
    the reordering; keep it off there anyway).  Only enable where no vmap
    wraps this call: vmapped lax.switch executes every branch.

    (The opt-in Pallas band-kernel variant of this stage was DELETED in
    round 5 on the sunset schedule PERF.md set: two measured generations
    lost to this XLA one-hot + MXU path — Mosaic has no batched
    dot_general, so the in-kernel trilinear reduction degenerates to a
    VPU plane loop.  See PERF.md "Pallas histogram kernels, settled".)
    """
    dtype = kp.x.dtype
    mr = with_row_units(mr)  # loop-invariant unit-gather view
    octaves = n_octaves or len(mr.shapes)
    r_max = desc_radius_bound(cfg)
    n = kp.capacity
    oov = octave_of_volume or tuple(range(octaves))
    oct_sel = jnp.clip(kp.octave - oov[0], 0, octaves - 1)
    gsel = vol_sel if vol_sel is not None else oct_sel
    shapes = mr.shapes[:octaves]

    # src/sift.cpp:620-625: coords were already halved, hence octave-1.
    if cfg.double_image_size:
        pden = [1.0 / math.pow(2, o - 1) for o in oov]
    else:
        pden = [1.0 / math.pow(2, o) for o in oov]
    pow_denom = lut(pden, oct_sel, dtype)
    x = (kp.x * pow_denom).astype(jnp.int32)  # C int truncation (src/sift.cpp:623)
    y = (kp.y * pow_denom).astype(jnp.int32)
    size = kp.size * pow_denom

    bins_per_rad = DESC_HIST_BINS / M_PI2
    cos_a = jnp.cos(kp.pori)
    sin_a = jnp.sin(kp.pori)

    hist_width = cfg.desc_scale_factor * size
    hw_safe = jnp.where(kp.valid & (hist_width > 0), hist_width, jnp.asarray(1, dtype))
    exp_denom = 0.5 * DESC_HIST_WIDTH * DESC_HIST_WIDTH
    tmp_radius = round_half_away(
        hist_width * 0.5 * math.sqrt(2.0) * (DESC_HIST_WIDTH + 1.0) + 0.5
    )
    # Clamp to the image diagonal (src/sift.cpp:636-639), per-lane by octave.
    diag = lut(
        [math.sqrt(s[2] * s[2] + s[1] * s[1]) for s in shapes], oct_sel, dtype
    )
    radius = jnp.minimum(tmp_radius, diag).astype(jnp.int32)

    width_l = lut([s[2] for s in shapes], oct_sel, jnp.int32)
    height_l = lut([s[1] for s in shapes], oct_sel, jnp.int32)
    layer_c = jnp.clip(kp.layer, 0, shapes[0][0] - 1)
    xc = jnp.clip(x, 0, width_l - 1)
    yc = jnp.clip(y, 0, height_l - 1)

    rr = jnp.arange(DESC_HIST_WIDTH)
    oo = jnp.arange(DESC_HIST_BINS)

    def make_desc_chunk(r: int, fast: bool = False):
        offs = jnp.arange(-r, r + 1)
        rg = offs[:, None].astype(dtype)  # (s, 1) row = y offset
        cg = offs[None, :].astype(dtype)  # (1, s) col = x offset
        s2 = (2 * r + 1) ** 2
        p = 2 * r + 3

        def desc_chunk(args):
            osel, lay, yy, xx, xo, yo, rad, hw, ca, sa, pori, wl, hl, vmask = args
            nc = lay.shape[0]
            patches = gather_patches_multi(
                mr, osel, lay, yy - r - 1, xx - r - 1, p
            )

            dx = patches[:, 1:-1, 2:] - patches[:, 1:-1, :-2]
            dy = patches[:, :-2, 1:-1] - patches[:, 2:, 1:-1]

            if fast:
                # Reciprocal-multiply instead of 2 divides per sample; the
                # ulp-level reordering is covered by the dispatch contract
                # (see docstring) and pinned by test_fused_f32.
                inv_hw = (1.0 / hw)[:, None, None]
                row_rot = (cg * sa[:, None, None] + rg * ca[:, None, None]) * inv_hw
                col_rot = (cg * ca[:, None, None] - rg * sa[:, None, None]) * inv_hw
            else:
                row_rot = (
                    cg * sa[:, None, None] + rg * ca[:, None, None]
                ) / hw[:, None, None]
                col_rot = (
                    cg * ca[:, None, None] - rg * sa[:, None, None]
                ) / hw[:, None, None]
            row_bin = (row_rot + DESC_HIST_WIDTH // 2) - 0.5
            col_bin = (col_rot + DESC_HIST_WIDTH // 2) - 0.5

            new_x = xo[:, None, None] + offs[None, None, :]
            new_y = yo[:, None, None] + offs[None, :, None]
            mask = (
                (row_bin > -1.0) & (row_bin < DESC_HIST_WIDTH)
                & (col_bin > -1.0) & (col_bin < DESC_HIST_WIDTH)
                & (new_x > 0) & (new_x < wl[:, None, None] - 1)
                & (new_y > 0) & (new_y < hl[:, None, None] - 1)
                & (jnp.abs(offs[None, None, :]) <= rad[:, None, None])
                & (jnp.abs(offs[None, :, None]) <= rad[:, None, None])
                & vmask[:, None, None]
            )

            magnitude = jnp.sqrt(dx * dx + dy * dy)
            angle = jnp.arctan2(dy, dx) - pori[:, None, None]
            angle = jnp.fmod(jnp.fmod(angle, M_PI2) + M_PI2, M_PI2)
            ori_bin = angle * bins_per_rad
            if fast:
                # Rotation preserves the norm: row_rot^2 + col_rot^2 ==
                # (i^2 + j^2) / hw^2, so the gaussian weight is SEPARABLE —
                # 2*(2r+1) exp calls per keypoint instead of (2r+1)^2.
                o2 = (offs * offs).astype(dtype)
                coef = ((1.0 / hw) * (1.0 / hw) / exp_denom)[:, None]
                g1 = jnp.exp(-o2[None, :] * coef)  # (nc, 2r+1)
                weight = g1[:, :, None] * g1[:, None, :]
            else:
                weight = jnp.exp(
                    -(row_rot * row_rot + col_rot * col_rot) / exp_denom
                )
            m = jnp.where(mask, magnitude * weight, jnp.asarray(0, dtype))

            row_bin = row_bin.reshape(nc, s2)
            col_bin = col_bin.reshape(nc, s2)
            ori_bin = ori_bin.reshape(nc, s2)
            m = m.reshape(nc, s2)

            base_r = jnp.floor(row_bin)
            base_c = jnp.floor(col_bin)
            base_o = jnp.floor(ori_bin)
            d_r = row_bin - base_r
            d_c = col_bin - base_c
            d_o = ori_bin - base_o
            base_r = base_r.astype(jnp.int32)
            base_c = base_c.astype(jnp.int32)
            base_o = base_o.astype(jnp.int32)

            fr = (m * (1.0 - d_r))[..., None] * (base_r[..., None] == rr) + (
                m * d_r
            )[..., None] * ((base_r + 1)[..., None] == rr)
            fc = (1.0 - d_c)[..., None] * (base_c[..., None] == rr) + d_c[
                ..., None
            ] * ((base_c + 1)[..., None] == rr)
            fo = (1.0 - d_o)[..., None] * (
                (base_o % DESC_HIST_BINS)[..., None] == oo
            ) + d_o[..., None] * (((base_o + 1) % DESC_HIST_BINS)[..., None] == oo)

            rc = fr[:, :, :, None] * fc[:, :, None, :]  # (nc, S2, 4, 4)
            hist = jnp.einsum("nsrc,nso->nrco", rc, fo)  # (nc, 4, 4, 8)
            return _hist_to_desc(hist.reshape(nc, 128))

        return desc_chunk

    chunk = min(chunk, n)
    nchunk = -(-n // chunk)
    pad_n = nchunk * chunk - n

    if dispatch_radius:
        radii = [r for r in (20, 24, 28, 32, 36) if r < r_max] + [r_max]
        thresholds = jnp.asarray(radii, jnp.int32)

        def zero_chunk(args):
            return jnp.zeros((args[1].shape[0], 128), jnp.uint8)

        branches = [zero_chunk] + [make_desc_chunk(r, fast=True) for r in radii]

        def run_chunk(args):
            rad, vmask = args[6], args[13]
            mx = jnp.max(jnp.where(vmask, rad, 0))
            cls = jnp.searchsorted(thresholds, mx).astype(jnp.int32)
            cls = jnp.where(jnp.any(vmask), cls + 1, 0)
            return jax.lax.switch(jnp.minimum(cls, len(radii)), branches, args)
    else:
        run_chunk = make_desc_chunk(r_max)

    def chunked(a):
        if pad_n:
            a = jnp.concatenate([a, jnp.zeros((pad_n,) + a.shape[1:], a.dtype)])
        return a.reshape((nchunk, chunk) + a.shape[1:])

    desc = jax.lax.map(
        run_chunk,
        (
            chunked(gsel), chunked(layer_c), chunked(yc), chunked(xc),
            chunked(x), chunked(y), chunked(radius), chunked(hw_safe),
            chunked(cos_a), chunked(sin_a), chunked(kp.pori),
            chunked(width_l), chunked(height_l), chunked(kp.valid),
        ),
    ).reshape(nchunk * chunk, 128)[:n]
    return desc


def compute_octave_descriptors(
    gauss: jnp.ndarray, kp: Keypoints, octave: int, cfg: SiftConfig
) -> jnp.ndarray:
    """Single-octave wrapper over compute_descriptors_all (staged path)."""
    return compute_descriptors_all(
        build_multi_rows([gauss]), kp, cfg, octave_of_volume=(octave,)
    )


def _hist_to_desc(hist: jnp.ndarray) -> jnp.ndarray:
    """convert_hist_to_desc (src/sift.cpp:576-603): L2 normalize, clip at 0.2,
    renormalize, floor(512 * v) clamped to 255.

    The reference has no epsilon (all-zero histograms become NaN garbage,
    src/sift.cpp:586-597); we emit zeros for that degenerate case instead.
    """
    norm = jnp.sqrt(jnp.sum(hist * hist, axis=1, keepdims=True))
    norm_safe = jnp.where(norm > 0, norm, 1.0)
    norm_inv = jnp.where(norm > 0, 1.0 / norm_safe, 0.0)
    h = jnp.minimum(hist * norm_inv, DESC_MAGNITUDE_THR)
    norm2 = jnp.sqrt(jnp.sum(h * h, axis=1, keepdims=True))
    norm2_safe = jnp.where(norm2 > 0, norm2, 1.0)
    norm2_inv = jnp.where(norm2 > 0, 1.0 / norm2_safe, 0.0)
    val = jnp.floor(INT_DESCR_FCTR * h * norm2_inv).astype(jnp.int32)
    return jnp.minimum(val, 255).astype(jnp.uint8)
