"""Pallas TPU kernels for the orientation/descriptor histogram stages.

Status (measured on TPU v5 lite, PERF.md): the XLA one-hot + batched-MXU
contraction paths in models/descriptor.py / models/orient.py WIN on-chip —
Mosaic has no batched dot_general, so an in-kernel trilinear reduction is a
VPU plane loop (128 masked multiply-reduces per keypoint block) that loses
to XLA's batched GEMM even though the kernel pays zero HBM for its one-hot
intermediates.  Two kernel generations were measured: extracted-patch
kernels (round 3: desc 53.9 vs 26.2 ms) and the raw row-BAND kernels kept
below (round 4: desc 89 vs 37 ms at bench caps — the band removes the
XLA-side extraction matmuls but processes the full 128-lane band).  The
band kernels stay as the single opt-in (`use_pallas_desc/orient`,
BENCH_PALLAS=1) for future Mosaic revisions; the patch kernels are deleted.

Numerics contract (band kernels): identical op set and masks as the XLA
fast path (descriptor.make_desc_chunk with fast=True) EXCEPT
  - arctan2 is a Cephes-style polynomial (Mosaic has no atan2 lowering);
    descriptors are continuous in the gradient angle, so the ~2-ulp angle
    error perturbs histogram floats by O(1e-7) — the same magnitude as the
    reduction reordering the window-dispatch contract already allows
    (sift.py _use_dispatch).  Oracle counts/match set pinned by
    test_fused_f32; never used on the f64 parity profile.
  - the reduction order is Mosaic's over the band, not einsum's.

Reference semantics being reproduced: src/sift.cpp:610-682 (sample loop),
:541-571 (trilinear update_histogram); see models/descriptor.py for the
full provenance map.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PI = 3.141592653589793
_PI_2 = 1.5707963267948966
_PI_4 = 0.7853981633974483
_TAN_PI_8 = 0.4142135623730951


def atan2_poly(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Branchless f32 atan2 from Mosaic-supported primitives (~2 ulp).

    Cephes atanf scheme: t = min/max in [0, 1]; fold t > tan(pi/8) to
    (t-1)/(t+1); degree-9 odd minimax polynomial; quadrant fixups.
    Zero-gradient samples (x == y == 0) return 0 (their magnitude weight is
    0, so the angle only needs to be finite).
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    t = mn / jnp.where(mx == 0, jnp.ones_like(mx), mx)
    fold = t > _TAN_PI_8
    u = jnp.where(fold, (t - 1.0) / (t + 1.0), t)
    z = u * u
    p = (
        ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z
        - 3.33329491539e-1
    ) * z * u + u
    p = jnp.where(fold, p + _PI_4, p)
    p = jnp.where(ay > ax, _PI_2 - p, p)
    p = jnp.where(x < 0, _PI - p, p)
    return jnp.where(y < 0, -p, p)


# ---------------------------------------------------------------------------
# Band kernels: raw gathered row bands instead of extracted patches.
#
# The extracted-patch kernels above still paid for the XLA-side one-hot
# row/column extraction matmuls and a (NC, p, p) patch materialization; the
# band kernels consume ops/gather.gather_patch_band output directly —
# window row j of lane n is band row oy + j, column c is lane ox + c — so
# the whole per-keypoint pipeline after the (cheap, unit-sized) row gather
# stays in VMEM.  Processing the full (R, L) band costs nothing extra on
# the lane axis (the patch kernels padded p -> 128 lanes anyway) and the
# masks already reject every band sample outside the true window.
# ---------------------------------------------------------------------------


def _desc_hist_band_kernel(
    flt_ref, int_ref, band_ref, out_ref, *, bins_per_rad: float, block: int
):
    """One block of NC keypoints: row bands (NC, R, L) -> histograms (NC, 128).

    Numerics contract: identical to _desc_hist_kernel (polynomial atan2,
    Mosaic reduction order) — the band holds the same pixel values at
    shifted coordinates, masked samples contribute exact zeros, and adding
    zeros never changes an f32 sum.

    flt columns: 0 cos(pori), 1 sin(pori), 2 pori, 3 1/hist_width, 4 coef.
    int columns: 0 x, 1 y (truncated octave coords), 2 radius, 3 width,
                 4 height, 5 valid, 6 oxr = ox + r + 1, 7 oyr = oy + r + 1
                 (the band coordinates of the window center).
    """
    x = band_ref[:]  # (NC, R, L)
    nc, R, L = x.shape
    dt = x.dtype
    # flt/ints/out are whole-array refs (their (block, 8) tiles would break
    # the (8, 128) tiling rule for block < 8); slice this step's rows.
    row0 = pl.program_id(0) * block

    def fcol(i):
        return flt_ref[pl.ds(row0, block), i : i + 1].reshape(nc, 1, 1)

    def icol(i):
        return int_ref[pl.ds(row0, block), i : i + 1].reshape(nc, 1, 1)

    ca, sa, pori, inv_hw, coef = (fcol(i) for i in range(5))
    xo, yo, rad, wl, hl, vmask, oxr, oyr = (icol(i) for i in range(8))

    # Gradients (inverted-y, src/sift.cpp:657-660).  Rolls wrap within the
    # band; wrapped rows/lanes only ever feed masked samples (an unmasked
    # sample's 1-pixel neighborhood stays inside the band by construction
    # of gather_patch_band).
    dx = pltpu.roll(x, L - 1, axis=2) - pltpu.roll(x, 1, axis=2)
    dy = pltpu.roll(x, 1, axis=1) - pltpu.roll(x, R - 1, axis=1)

    ri = jax.lax.broadcasted_iota(jnp.int32, (nc, R, L), 1)
    li = jax.lax.broadcasted_iota(jnp.int32, (nc, R, L), 2)
    j_off = ri - oyr  # y offset of the sample from the window center
    i_off = li - oxr  # x offset
    rgf = j_off.astype(dt)
    cgf = i_off.astype(dt)

    row_rot = (cgf * sa + rgf * ca) * inv_hw
    col_rot = (cgf * ca - rgf * sa) * inv_hw
    row_bin = (row_rot + 2.0) - 0.5  # DESC_HIST_WIDTH // 2 = 2
    col_bin = (col_rot + 2.0) - 0.5

    new_x = xo + i_off
    new_y = yo + j_off
    mask = (
        (row_bin > -1.0)
        & (row_bin < 4.0)
        & (col_bin > -1.0)
        & (col_bin < 4.0)
        & (new_x > 0)
        & (new_x < wl - 1)
        & (new_y > 0)
        & (new_y < hl - 1)
        & (jnp.abs(i_off) <= rad)
        & (jnp.abs(j_off) <= rad)
        & (vmask != 0)
    )

    magnitude = jnp.sqrt(dx * dx + dy * dy)
    angle = atan2_poly(dy, dx) - pori
    two_pi = jnp.asarray(2.0 * _PI, dt)
    angle = jnp.fmod(jnp.fmod(angle, two_pi) + two_pi, two_pi)
    ori_bin = angle * jnp.asarray(bins_per_rad, dt)
    weight = jnp.exp(-(cgf * cgf + rgf * rgf) * coef)
    m = jnp.where(mask, magnitude * weight, jnp.zeros_like(x))

    base_r = jnp.floor(row_bin)
    base_c = jnp.floor(col_bin)
    d_r = row_bin - base_r
    d_c = col_bin - base_c
    d_o = ori_bin - jnp.floor(ori_bin)
    base_r = base_r.astype(jnp.int32)
    base_c = base_c.astype(jnp.int32)
    io0 = jnp.floor(ori_bin).astype(jnp.int32) % 8
    io1 = (io0 + 1) % 8

    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    ar = [
        jnp.where(base_r == rr, m * (one - d_r), zero)
        + jnp.where(base_r == rr - 1, m * d_r, zero)
        for rr in range(4)
    ]
    vc = [
        jnp.where(base_c == cc, one - d_c, zero)
        + jnp.where(base_c == cc - 1, d_c, zero)
        for cc in range(4)
    ]
    wo = [
        jnp.where(io0 == oo, one - d_o, zero)
        + jnp.where(io1 == oo, d_o, zero)
        for oo in range(8)
    ]

    cols = []
    for rr in range(4):
        for cc in range(4):
            prc = ar[rr] * vc[cc]
            for oo in range(8):
                s1 = jnp.sum(prc * wo[oo], axis=2)  # (nc, R)
                cols.append(jnp.sum(s1, axis=1, keepdims=True))  # (nc, 1)
    out_ref[pl.ds(row0, block), :] = jnp.concatenate(cols, axis=1)


def _ori_hist_band_kernel(
    flt_ref, int_ref, band_ref, out_ref, *, nb: int, block: int
):
    """One block of NC keypoints: row bands (NC, R, L) -> 36-bin histograms.

    Mirrors _ori_hist_kernel with band coordinates (see
    _desc_hist_band_kernel).  flt: 0 inv_edenom; int: 0 x, 1 y, 2 radius,
    3 width, 4 height, 5 valid, 6 oxr, 7 oyr.
    """
    x = band_ref[:]
    nc, R, L = x.shape
    dt = x.dtype
    row0 = pl.program_id(0) * block
    inv_ed = flt_ref[pl.ds(row0, block), 0:1].reshape(nc, 1, 1)

    def icol(i):
        return int_ref[pl.ds(row0, block), i : i + 1].reshape(nc, 1, 1)

    xo, yo, rad, wl, hl, vmask, oxr, oyr = (icol(i) for i in range(8))

    dx = pltpu.roll(x, L - 1, axis=2) - pltpu.roll(x, 1, axis=2)
    dy = pltpu.roll(x, 1, axis=1) - pltpu.roll(x, R - 1, axis=1)

    ri = jax.lax.broadcasted_iota(jnp.int32, (nc, R, L), 1)
    li = jax.lax.broadcasted_iota(jnp.int32, (nc, R, L), 2)
    j_off = ri - oyr
    i_off = li - oxr

    mask = (
        (jnp.abs(i_off) <= rad)
        & (jnp.abs(j_off) <= rad)
        & (xo + i_off - 1 >= 0)
        & (xo + i_off + 1 <= wl - 1)
        & (yo + j_off - 1 >= 0)
        & (yo + j_off + 1 <= hl - 1)
        & (vmask != 0)
    )
    magnitude = jnp.sqrt(dx * dx + dy * dy)
    angle = atan2_poly(dy, dx)
    b_f = (angle + _PI) * jnp.asarray(nb / (2.0 * _PI), dt)
    h_idx = jnp.floor(b_f + 0.5).astype(jnp.int32)
    h_idx = jnp.where(h_idx < nb, h_idx, 0)
    fi = (i_off * i_off + j_off * j_off).astype(dt)
    contrib = jnp.where(
        mask, jnp.exp(-fi * inv_ed) * magnitude, jnp.zeros_like(x)
    )
    cols = []
    for b in range(nb):
        s1 = jnp.sum(
            jnp.where(h_idx == b, contrib, jnp.zeros_like(x)), axis=2
        )  # (nc, R)
        cols.append(jnp.sum(s1, axis=1, keepdims=True))  # (nc, 1)
    out_ref[pl.ds(row0, block), :] = jnp.concatenate(cols, axis=1)


def _band_block(R: int, L: int, planes: int = 34) -> int:
    """Keypoints per grid step keeping ~planes live (NC, R, L) f32 planes
    within a ~12 MB VMEM budget (power of two, >= 2)."""
    budget = 12 * 1024 * 1024
    blk = 16
    while blk > 2 and blk * (-(-R // 8) * 8) * L * 4 * planes > budget:
        blk //= 2
    return blk


def desc_hist_band_pallas(
    band: jnp.ndarray,
    flt: jnp.ndarray,
    ints: jnp.ndarray,
    bins_per_rad: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, R, L) row bands + per-keypoint scalars -> (N, 128) f32 hists."""
    n, R, L = band.shape
    block = _band_block(R, L)
    assert n % block == 0, (n, block)
    kernel = partial(
        _desc_hist_band_kernel, bins_per_rad=bins_per_rad, block=block
    )
    return pl.pallas_call(
        kernel,
        grid=(n // block,),
        out_shape=jax.ShapeDtypeStruct((n, 128), band.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block, R, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(flt, ints, band)


def ori_hist_band_pallas(
    band: jnp.ndarray,
    flt: jnp.ndarray,
    ints: jnp.ndarray,
    nb: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, R, L) row bands + per-keypoint scalars -> (N, nb) f32 hists."""
    n, R, L = band.shape
    block = _band_block(R, L, planes=30)
    assert n % block == 0, (n, block)
    kernel = partial(_ori_hist_band_kernel, nb=nb, block=block)
    return pl.pallas_call(
        kernel,
        grid=(n // block,),
        out_shape=jax.ShapeDtypeStruct((n, nb), band.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block, R, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(flt, ints, band)
