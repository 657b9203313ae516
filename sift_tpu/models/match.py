"""Descriptor matching: blocked top-2 L2 distance on the MXU.

TPU-native rebuild of match_keypoints / euclid_dist (src/sift.cpp:688-695,
783-815).  The reference's O(N*M*128) scalar loop becomes
||a||^2 + ||b||^2 - 2 a.b^T as a matmul.  Because descriptors are uint8, every
squared distance is an integer <= 128 * 255^2 < 2^23, exactly representable in
f32, so the HIGHEST-precision MXU matmul is *exact* and the Lowe ratio test
``best < 0.75 * second`` (src/sift.cpp:808) becomes the exact int32 predicate
16*best^2 < 9*second^2 — bit-faithful to the C++ f64 sqrt comparison (sqrt is
monotone and distinct integers keep distinct f64 sqrts at this magnitude).
"""

from __future__ import annotations

from fractions import Fraction

import jax
import jax.numpy as jnp

# Sentinel for masked columns: larger than any real squared distance (< 2^23)
# and small enough that 16 * HUGE fits int32.  With ratio 3/4 the sentinel
# reproduces both reference edge cases automatically: a lone neighbor
# (second == HUGE) always accepts, an empty target set (best == HUGE) never
# does (src/sift.cpp:791-808 with DBL_MAX initial distances).
_HUGE_D2 = 1 << 24


def pairwise_sq_dists(desc1: jnp.ndarray, desc2: jnp.ndarray) -> jnp.ndarray:
    """(N, M) int32 exact squared L2 distances between uint8 descriptor sets."""
    a = desc1.astype(jnp.float32)
    b = desc2.astype(jnp.float32)
    g = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), precision=jax.lax.Precision.HIGHEST
    )
    na = jnp.sum(a * a, axis=1)
    nb = jnp.sum(b * b, axis=1)
    d2 = na[:, None] + nb[None, :] - 2.0 * g
    return d2.astype(jnp.int32)


def match_descriptors(
    desc1: jnp.ndarray,
    valid1: jnp.ndarray,
    desc2: jnp.ndarray,
    valid2: jnp.ndarray,
    ratio_threshold: float = 0.75,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One-directional Lowe-ratio matching (no cross-check, like the reference).

    Returns (best_idx (N,), accept (N,), best_d2 (N,), second_d2 (N,)).
    Tie-breaking matches the reference: first index wins for best
    (strict ``<`` at src/sift.cpp:799); duplicates of the best distance still
    count as second-best (src/sift.cpp:803).
    """
    m = desc2.shape[0]

    d2 = pairwise_sq_dists(desc1, desc2)
    d2 = jnp.where(valid2[None, :], d2, _HUGE_D2)

    best_idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
    best = jnp.take_along_axis(d2, best_idx[:, None], axis=1)[:, 0]
    cols = jnp.arange(m, dtype=jnp.int32)
    d2_wo_best = jnp.where(cols[None, :] == best_idx[:, None], _HUGE_D2, d2)
    second = jnp.min(d2_wo_best, axis=1)

    # best < ratio * second  <=>  q * best^2 < p * second^2 with p/q = ratio^2.
    frac = Fraction(ratio_threshold * ratio_threshold).limit_denominator(64)
    if abs(float(frac) - ratio_threshold * ratio_threshold) < 1e-12:
        p, q = frac.numerator, frac.denominator  # (9, 16) for the default
        accept = (q * best) < (p * second)
    else:
        r2 = jnp.float32(ratio_threshold * ratio_threshold)
        accept = best.astype(jnp.float32) < r2 * second.astype(jnp.float32)
    accept = accept & valid1 & (best < _HUGE_D2)
    return best_idx, accept, best, second
