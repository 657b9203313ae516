"""Pallas TPU kernels for the separable gaussian blur.

The pyramid blur (ops/blur.py) is a chain of shifted adds; under XLA each
blur is ~2K elementwise HLOs streamed through HBM.  These kernels fuse a
whole 1D pass into one VMEM-resident program: the image lives in VMEM, taps
accumulate with ``pltpu.roll`` + static border fixes that reproduce the
reference's clamp-at-border indexing (src/image.cpp:174-181) exactly, and a
single HBM read/write pair per pass remains.

Whole-image blocks keep the kernel simple and exact; callers fall back to
the XLA path when 2 * H * W * 4 bytes would overflow VMEM (utils below).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sift_tpu.config import half_kernel_weight_sum

# Leave headroom below the ~16 MB/core VMEM for compiler temporaries.
_VMEM_BUDGET = 12 * 1024 * 1024


def pallas_blur_fits(shape, dtype=jnp.float32) -> bool:
    h, w = shape[-2], shape[-1]
    return 2 * h * w * jnp.dtype(dtype).itemsize <= _VMEM_BUDGET


def _shift_clamped_tpu(x, u: int, axis: int):
    """x indexed at i+u with clamp to [0, n-1] along axis (static u)."""
    n = x.shape[axis]
    if u == 0:
        return x
    # pltpu.roll requires non-negative shifts; roll(x, n-u) == jnp.roll(x, -u)
    rolled = pltpu.roll(x, (n - u) % n if u > 0 else -u, axis=axis)
    if axis == 1 or axis == -1:
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        if u > 0:
            edge = jax.lax.slice_in_dim(x, n - 1, n, axis=1)
            return jnp.where(idx >= n - u, edge, rolled)
        edge = jax.lax.slice_in_dim(x, 0, 1, axis=1)
        return jnp.where(idx < -u, edge, rolled)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    if u > 0:
        edge = jax.lax.slice_in_dim(x, n - 1, n, axis=0)
        return jnp.where(idx >= n - u, edge, rolled)
    edge = jax.lax.slice_in_dim(x, 0, 1, axis=0)
    return jnp.where(idx < -u, edge, rolled)


def _pass_kernel(in_ref, out_ref, *, taps, inv_sum, axis):
    x = in_ref[:]
    acc = x * taps[0]
    for u in range(1, len(taps)):
        acc = acc + taps[u] * (
            _shift_clamped_tpu(x, u, axis) + _shift_clamped_tpu(x, -u, axis)
        )
    out_ref[:] = acc * inv_sum


def _one_pass(img, taps, axis, interpret):
    """One 1D pass, gridded over the NON-convolved axis.

    Rows are independent in the horizontal pass and columns in the vertical
    pass, so blocks along the orthogonal axis need no halos and the scoped
    VMEM footprint stays a few tap-temporaries times one strip.
    """
    h, w = img.shape
    inv_sum = 1.0 / half_kernel_weight_sum(list(taps))
    kernel = partial(_pass_kernel, taps=tuple(taps), inv_sum=inv_sum, axis=axis)
    if axis in (1, -1):  # horizontal: strip over rows
        tr = min(h, 256)
        grid = (-(-h // tr),)
        spec = pl.BlockSpec((tr, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    else:  # vertical: strip over columns
        tc = min(w, 256)
        grid = (-(-w // tc),)
        spec = pl.BlockSpec((h, tc), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct(img.shape, img.dtype),
        in_specs=[spec],
        out_specs=spec,
        interpret=interpret,
    )(img)


def pallas_separable_blur(img, half_kernel, interpret: bool = False):
    """(H, W) separable blur, reference border semantics, VMEM-resident.

    Matches ops.blur.separable_blur up to f32 division-order rounding (the
    XLA path divides by sum_w; here the reciprocal is folded — identical in
    the f64 parity profile is not needed since that profile keeps the XLA
    path).
    """
    taps = [float(t) for t in half_kernel]
    tmp = _one_pass(img, taps, 1, interpret)  # horizontal (x) first
    return _one_pass(tmp, taps, 0, interpret)  # then vertical (y)
