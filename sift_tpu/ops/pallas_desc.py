"""Pallas TPU kernel for the descriptor trilinear-histogram stage.

The XLA formulation (models/descriptor.py) builds per-sample one-hot factors
fr (N, S^2, 4), fc (N, S^2, 4), fo (N, S^2, 8), materializes the outer
product rc = fr x fc (N, S^2, 16) and contracts rc with fo on the MXU —
every intermediate streams through HBM and the one-hot extraction matmuls
run at HIGHEST precision (6 bf16 passes).  This kernel keeps the whole
per-keypoint pipeline — gradients, magnitude/angle, gaussian weight, masks,
trilinear binning, and the 4x4x8 histogram reduction — resident in VMEM:
one read of the gathered patches, one (N, 128) histogram write.

Numerics contract: identical op set and masks as the XLA fast path
(descriptor.make_desc_chunk with fast=True) EXCEPT
  - arctan2 is a Cephes-style polynomial (Mosaic has no atan2 lowering);
    descriptors are continuous in the gradient angle, so the ~2-ulp angle
    error perturbs histogram floats by O(1e-7) — the same magnitude as the
    reduction reordering the window-dispatch contract already allows
    (sift.py _use_dispatch).  Oracle counts/match set pinned by
    test_fused_f32; never used on the f64 parity profile.
  - the (p, p) plane reduction order is Mosaic's, not einsum's.

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

# Keypoints per grid step.  VMEM budget: ~20 live (NC, p, p<=83->128 lanes)
# f32 planes = ~7 MB at the worst-case radius.
DESC_KERNEL_BLOCK = 8

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


def _desc_hist_kernel(
    flt_ref, int_ref, patch_ref, out_ref, *, r: int, bins_per_rad: float
):
    """One block of NC keypoints: patches (NC, p, p) -> histograms (NC, 128).

    flt columns: 0 cos(pori), 1 sin(pori), 2 pori, 3 1/hist_width,
                 4 coef = (1/hw)^2 / exp_denom  (gaussian weight separable
                 coefficient; equals 1/(hw^2 * 0.5 * 4^2), src/sift.cpp:635)
    int columns: 0 x, 1 y (truncated octave coords), 2 radius, 3 width,
                 4 height, 5 valid
    """
    x = patch_ref[:]  # (NC, p, p)
    nc, p, _ = x.shape
    dt = x.dtype

    # Column extraction and reductions stay rank>=2 throughout: rank-1
    # values crash the Mosaic layout inference on real TPU ("arr.size() >=
    # layout_rank (1 vs 2)"); interpret mode never catches this.
    def fcol(i):
        return flt_ref[:, i : i + 1].reshape(nc, 1, 1)

    def icol(i):
        return int_ref[:, i : i + 1].reshape(nc, 1, 1)

    ca, sa, pori, inv_hw, coef = (fcol(i) for i in range(5))
    xo, yo, rad, wl, hl, vmask = (icol(i) for i in range(6))

    # Gradients with the reference's inverted-y convention
    # (src/sift.cpp:657-660): dx[c] = x[c+1] - x[c-1]; dy[row] = x[row-1] -
    # x[row+1].  pltpu.roll(x, s)[i] = x[i - s]; rolls wrap within each
    # keypoint's plane and the wrapped rows/cols (0 and p-1) are never
    # sample positions (the patch carries a 1-pixel gradient halo).
    dx = pltpu.roll(x, p - 1, axis=2) - pltpu.roll(x, 1, axis=2)
    dy = pltpu.roll(x, 1, axis=1) - pltpu.roll(x, p - 1, axis=1)

    ri = jax.lax.broadcasted_iota(jnp.int32, (nc, p, p), 1)
    li = jax.lax.broadcasted_iota(jnp.int32, (nc, p, p), 2)
    j_off = ri - (r + 1)  # y offset of the sample
    i_off = li - (r + 1)  # x offset
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
    # Separable gaussian weight: rotation preserves the norm, so
    # exp(-(row_rot^2+col_rot^2)/exp_denom) == exp(-(i^2+j^2) * coef).
    weight = jnp.exp(-(cgf * cgf + rgf * rgf) * coef)
    m = jnp.where(mask, magnitude * weight, jnp.zeros_like(x))

    base_r = jnp.floor(row_bin)
    base_c = jnp.floor(col_bin)
    base_o = jnp.floor(ori_bin)
    d_r = row_bin - base_r
    d_c = col_bin - base_c
    d_o = ori_bin - base_o
    base_r = base_r.astype(jnp.int32)
    base_c = base_c.astype(jnp.int32)
    io0 = jnp.floor(ori_bin).astype(jnp.int32) % 8
    io1 = (io0 + 1) % 8

    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    # Trilinear one-hot factors, magnitude folded into the row factor so the
    # per-contribution multiply chain stays ((m * f_r) * f_c) * f_o.
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
                s1 = jnp.sum(prc * wo[oo], axis=2)  # (nc, p)
                cols.append(jnp.sum(s1, axis=1, keepdims=True))  # (nc, 1)
    out_ref[:] = jnp.concatenate(cols, axis=1)


def _ori_hist_kernel(
    flt_ref, int_ref, patch_ref, out_ref, *, r: int, nb: int
):
    """One block of NC keypoints: patches (NC, p, p) -> 36-bin histograms.

    Mirrors models/orient.py make_hist_chunk (src/sift.cpp:462-490): gradient
    magnitude/angle over the sample window, gaussian weight
    exp(-(i^2+j^2)/edenom), hard bin assignment round(nb*(theta+pi)/2pi) with
    wrap, masked accumulation.  flt columns: 0 inv_edenom; int columns:
    0 x, 1 y, 2 radius, 3 width, 4 height, 5 valid.
    """
    x = patch_ref[:]
    nc, p, _ = x.shape
    dt = x.dtype
    # rank>=2 throughout (see _desc_hist_kernel).
    inv_ed = flt_ref[:, 0:1].reshape(nc, 1, 1)
    xo = int_ref[:, 0:1].reshape(nc, 1, 1)
    yo = int_ref[:, 1:2].reshape(nc, 1, 1)
    rad = int_ref[:, 2:3].reshape(nc, 1, 1)
    wl = int_ref[:, 3:4].reshape(nc, 1, 1)
    hl = int_ref[:, 4:5].reshape(nc, 1, 1)
    vmask = int_ref[:, 5:6].reshape(nc, 1, 1)

    dx = pltpu.roll(x, p - 1, axis=2) - pltpu.roll(x, 1, axis=2)
    dy = pltpu.roll(x, 1, axis=1) - pltpu.roll(x, p - 1, axis=1)

    ri = jax.lax.broadcasted_iota(jnp.int32, (nc, p, p), 1)
    li = jax.lax.broadcasted_iota(jnp.int32, (nc, p, p), 2)
    j_off = ri - (r + 1)
    i_off = li - (r + 1)

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
    # round-half-away bin (src/sift.cpp:489-490), wrap nb -> 0.
    b_f = (angle + _PI) * jnp.asarray(nb / (2.0 * _PI), dt)
    h_idx = jnp.floor(b_f + 0.5).astype(jnp.int32)  # angle+pi >= 0
    h_idx = jnp.where(h_idx < nb, h_idx, 0)
    fi = (i_off * i_off + j_off * j_off).astype(dt)
    contrib = jnp.where(
        mask, jnp.exp(-fi * inv_ed) * magnitude, jnp.zeros_like(x)
    )
    cols = []
    for b in range(nb):
        s1 = jnp.sum(
            jnp.where(h_idx == b, contrib, jnp.zeros_like(x)), axis=2
        )  # (nc, p)
        cols.append(jnp.sum(s1, axis=1, keepdims=True))  # (nc, 1)
    out_ref[:] = jnp.concatenate(cols, axis=1)


def ori_hist_pallas(
    patches: jnp.ndarray,
    flt: jnp.ndarray,
    ints: jnp.ndarray,
    r: int,
    nb: int,
    block: int = DESC_KERNEL_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, p, p) patches + per-keypoint scalars -> (N, nb) f32 histograms."""
    n, p, _ = patches.shape
    assert n % block == 0, (n, block)
    kernel = partial(_ori_hist_kernel, r=r, nb=nb)
    return pl.pallas_call(
        kernel,
        grid=(n // block,),
        out_shape=jax.ShapeDtypeStruct((n, nb), patches.dtype),
        in_specs=[
            pl.BlockSpec((block, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block, p, p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block, nb), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(flt, ints, patches)


def desc_hist_pallas(
    patches: jnp.ndarray,
    flt: jnp.ndarray,
    ints: jnp.ndarray,
    r: int,
    bins_per_rad: float,
    block: int = DESC_KERNEL_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, p, p) gathered patches + per-keypoint scalars -> (N, 128) f32 hist.

    N must be a multiple of ``block``; ``flt`` is (N, 8) f32 and ``ints``
    (N, 8) i32 packed as documented on the kernel.
    """
    n, p, _ = patches.shape
    assert n % block == 0, (n, block)
    grid = (n // block,)
    kernel = partial(_desc_hist_kernel, r=r, bins_per_rad=bins_per_rad)
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((n, 128), patches.dtype),
        in_specs=[
            pl.BlockSpec((block, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block, p, p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # Worst-case-radius windows keep ~30 live (block, p, 128-lane)
            # f32 planes; raise the scoped VMEM budget instead of shrinking
            # the block below the 8-sublane tile.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(flt, ints, patches)
