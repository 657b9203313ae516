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
    """Can the strip kernels handle this image?  (Strips grid over the
    non-convolved axis, so only one extreme dimension can overflow VMEM.)"""
    h, w = shape[-2], shape[-1]
    ib = jnp.dtype(dtype).itemsize
    return 2 * 8 * w * ib <= _VMEM_BUDGET and 2 * h * 128 * ib <= _VMEM_BUDGET


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


def _pass_kernel(in_ref, out_ref, *, taps, sum_w, axis, batched):
    x = in_ref[0] if batched else in_ref[:]
    acc = x * taps[0]
    for u in range(1, len(taps)):
        acc = acc + taps[u] * (
            _shift_clamped_tpu(x, u, axis) + _shift_clamped_tpu(x, -u, axis)
        )
    # True division by sum_w (not reciprocal multiply): same rounding as the
    # XLA path, so both paths produce bit-identical f32 pyramids.
    acc = acc / jnp.asarray(sum_w, x.dtype)
    if batched:
        out_ref[0] = acc
    else:
        out_ref[:] = acc


# Per-strip VMEM target.  Mosaic materializes several per-tap temporaries
# (rolled copy, edge broadcast, select) on the scoped stack, so the strip
# must stay well under the 16 MB scoped-VMEM limit divided by ~8 live
# buffers (measured: 4 MB strips overflow at 16.3 MB scoped).
_STRIP_BYTES = 1024 * 1024


def _one_pass(img, taps, axis, interpret):
    """One 1D pass, gridded over the NON-convolved axis (and the batch).

    Rows are independent in the horizontal pass and columns in the vertical
    pass, so blocks along the orthogonal axis need no halos and the VMEM
    footprint stays a few tap-temporaries times one strip.  ``img`` is
    (H, W) or (B, H, W); a leading batch dim becomes the major grid axis.
    """
    batched = img.ndim == 3
    h, w = img.shape[-2], img.shape[-1]
    ib = jnp.dtype(img.dtype).itemsize
    sum_w = half_kernel_weight_sum(list(taps))
    kernel = partial(
        _pass_kernel, taps=tuple(taps), sum_w=sum_w, axis=axis, batched=batched
    )
    if axis in (1, -1):  # horizontal: strip over rows
        tr = min(h, max(8, _STRIP_BYTES // (2 * w * ib) // 8 * 8))
        grid = (-(-h // tr),)
        blk, imap = (tr, w), lambda i: (i, 0)
    else:  # vertical: strip over columns
        tc = min(w, max(128, _STRIP_BYTES // (2 * h * ib) // 128 * 128))
        grid = (-(-w // tc),)
        blk, imap = (h, tc), lambda i: (0, i)
    if batched:
        grid = (img.shape[0],) + grid
        blk = (1,) + blk
        inner = imap
        imap = lambda b, i: (b,) + inner(i)
    spec = pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct(img.shape, img.dtype),
        in_specs=[spec],
        out_specs=spec,
        interpret=interpret,
    )(img)


def pallas_separable_blur(img, half_kernel, interpret: bool = False):
    """(H, W) or (B, H, W) separable blur, reference border semantics.

    Same accumulation order and true division by sum_w as
    ops.blur.separable_blur; remaining differences are FMA-contraction
    choices in the compiled elementwise chain (last ulp).  Do NOT vmap this —
    pass the batch explicitly; jax's pallas batching rule would lift the
    batch into the block shape and overflow VMEM on large images.
    """
    taps = [float(t) for t in half_kernel]
    tmp = _one_pass(img, taps, 1, interpret)  # horizontal (x) first
    return _one_pass(tmp, taps, 0, interpret)  # then vertical (y)
