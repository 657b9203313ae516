"""Pallas streaming builder for the twin-block row layout (ops/gather.py).

The XLA construction of BlockRows (pad -> reshape -> concat twins) costs
~11 ms for the batched gaussian stacks on v5e — XLA materializes the
interleaved concat through HBM at well below stream rate.  This kernel
reads each row strip once and writes the nb twin blocks with static lane
slices, all in VMEM: (R, (nb+1)*blk) -> (R, nb, 2*blk).

Pure data movement (no arithmetic), so bit-exactness is trivial; the f64
parity profile keeps the XLA path (Mosaic kernels are f32-only here).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _twin_kernel(in_ref, out_ref, *, nb, blk):
    x = in_ref[:]  # (strip, (nb + 1) * blk)
    for b in range(nb):
        out_ref[:, b, :] = x[:, b * blk : (b + 2) * blk]


def twin_rows_2d(
    mat: jnp.ndarray, blk: int, interpret: bool | None = None
) -> jnp.ndarray:
    """(R, W) -> (R * nb, 2 * blk) twin-block rows (zero-padded past W).

    Row r block b holds columns [b * blk, (b + 2) * blk) of ``mat``; output
    row index is r * nb + b — identical to the XLA construction in
    gather.build_block_rows.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r, w = mat.shape
    nb = -(-w // blk)
    wp = (nb + 1) * blk
    mat = jnp.pad(mat, ((0, 0), (0, wp - w)))
    strip = 256
    while strip * wp * 4 * 4 > 12 * 1024 * 1024 and strip > 8:
        strip //= 2
    grid = (-(-r // strip),)
    out = pl.pallas_call(
        partial(_twin_kernel, nb=nb, blk=blk),
        grid=grid,
        in_specs=[pl.BlockSpec((strip, wp), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((strip, nb, 2 * blk), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((r, nb, 2 * blk), mat.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(mat)
    return out.reshape(r * nb, 2 * blk)


def twin_fits(mat_shape, dtype) -> bool:
    return jnp.dtype(dtype) == jnp.float32
