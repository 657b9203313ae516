"""Pallas TPU kernel: blocked top-2 L2 matcher.

One pass over the descriptor sets: per (row-block, col-block) grid step the
kernel computes the exact-int squared-distance tile on the MXU
(||a||^2 + ||b||^2 - 2 a.b^T in f32, exact because descriptors are uint8,
see models/match.py) and folds it into a running (best, second, best_idx)
held in VMEM scratch — the (N, M) distance matrix is never materialized in
HBM, unlike the XLA path.  Tie-breaking matches the reference scan order
(src/sift.cpp:799-806): earlier columns win equal distances because column
blocks are visited in ascending order and merges prefer the running value on
ties.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sift_tpu.models.match import _HUGE_D2

_TN = 256  # rows (A descriptors) per block
_TM = 512  # cols (B descriptors) per block


def _kernel(a_ref, na_ref, b_ref, nb_ref, vb_ref,
            best_ref, second_ref, idx_ref,
            rb_best, rb_second, rb_idx):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        rb_best[:] = jnp.full_like(rb_best, float(_HUGE_D2))
        rb_second[:] = jnp.full_like(rb_second, float(_HUGE_D2))
        rb_idx[:] = jnp.zeros_like(rb_idx)

    a = a_ref[:]          # (TN, 128) f32
    b = b_ref[:]          # (TM, 128) f32
    g = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    na = na_ref[0, pl.ds(i * _TN, _TN)]   # (TN,)
    nb = nb_ref[0, pl.ds(j * _TM, _TM)]   # (TM,)
    vb = vb_ref[0, pl.ds(j * _TM, _TM)]
    # f32 throughout: all distances are integers < 2^24 (exact in f32) and
    # Mosaic's argmin lowering supports only float32.
    huge = jnp.float32(_HUGE_D2)
    d2 = na.reshape(-1, 1) + nb.reshape(1, -1) - 2.0 * g
    d2 = jnp.where(vb.reshape(1, -1) != 0, d2, huge)

    # Tile top-2 per row.
    tile_best = jnp.min(d2, axis=1)
    tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    d2_wo = jnp.where(cols == tile_arg[:, None], huge, d2)
    tile_second = jnp.min(d2_wo, axis=1)
    tile_idx = tile_arg + j * _TM

    b1 = rb_best[0, :]
    b2 = rb_second[0, :]
    i1 = rb_idx[0, :]
    # Merge: strict < so earlier (running) wins ties == reference scan order.
    take_new = tile_best < b1
    new_b1 = jnp.where(take_new, tile_best, b1)
    new_i1 = jnp.where(take_new, tile_idx, i1)
    # Displaced best joins the second-best pool.
    new_b2 = jnp.minimum(
        jnp.where(take_new, b1, tile_best),
        jnp.minimum(b2, tile_second),
    )
    rb_best[0, :] = new_b1
    rb_second[0, :] = new_b2
    rb_idx[0, :] = new_i1

    @pl.when(j == nj - 1)
    def _():
        best_ref[i, :] = rb_best[0, :].astype(jnp.int32)
        second_ref[i, :] = rb_second[0, :].astype(jnp.int32)
        idx_ref[i, :] = rb_idx[0, :]


@partial(jax.jit, static_argnames=("interpret",))
def pallas_top2(desc1, valid1, desc2, valid2, interpret: bool = False):
    """(best_d2, second_d2, best_idx) int32 per row of desc1 vs desc2.

    Capacities are padded to block multiples; invalid B columns carry the
    HUGE sentinel exactly like models.match.match_descriptors.
    """
    n, m = desc1.shape[0], desc2.shape[0]
    n_pad = -(-n // _TN) * _TN
    m_pad = -(-m // _TM) * _TM

    a = jnp.zeros((n_pad, 128), jnp.float32).at[:n].set(desc1.astype(jnp.float32))
    b = jnp.zeros((m_pad, 128), jnp.float32).at[:m].set(desc2.astype(jnp.float32))
    vb = jnp.zeros((1, m_pad), jnp.int32).at[0, :m].set(valid2.astype(jnp.int32))
    na = jnp.sum(a * a, axis=1).reshape(1, -1)
    nb = jnp.sum(b * b, axis=1).reshape(1, -1)

    ni = n_pad // _TN
    grid = (ni, m_pad // _TM)
    full = lambda i, j: (0, 0)
    best, second, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TN, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, 128), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ni, _TN), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((ni, _TN), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((ni, _TN), full, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ni, _TN), jnp.int32),
            jax.ShapeDtypeStruct((ni, _TN), jnp.int32),
            jax.ShapeDtypeStruct((ni, _TN), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, _TN), jnp.float32),
            pltpu.VMEM((1, _TN), jnp.float32),
            pltpu.VMEM((1, _TN), jnp.int32),
        ],
        interpret=interpret,
    )(a, na, b, nb, vb)
    return (
        best.reshape(-1)[:n],
        second.reshape(-1)[:n],
        idx.reshape(-1)[:n],
    )


def match_descriptors_pallas(desc1, valid1, desc2, valid2,
                             ratio_threshold: float = 0.75,
                             interpret: bool = False):
    """Drop-in replacement for models.match.match_descriptors on TPU."""
    from fractions import Fraction

    best, second, best_idx = pallas_top2(
        desc1, valid1, desc2, valid2, interpret=interpret
    )
    frac = Fraction(ratio_threshold * ratio_threshold).limit_denominator(64)
    if abs(float(frac) - ratio_threshold * ratio_threshold) < 1e-12:
        p, q = frac.numerator, frac.denominator
        accept = (q * best) < (p * second)
    else:
        r2 = jnp.float32(ratio_threshold * ratio_threshold)
        accept = best.astype(jnp.float32) < r2 * second.astype(jnp.float32)
    accept = accept & valid1 & (best < _HUGE_D2)
    return best_idx, accept, best, second
