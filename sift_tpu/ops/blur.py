"""Separable gaussian blur with the reference's exact border semantics.

The reference blurs with a one-sided symmetric half-kernel and clamps
out-of-range taps to the border pixel, then divides by the applied-weight sum
(/root/reference/src/image.cpp:156-238).  Because ``sum_w`` accumulates ``2*w``
per tap unconditionally (src/image.cpp:184), the normalizer is a constant, so
the whole op is: replicate-pad separable convolution normalized by the full
kernel sum.  The unnormalized coefficient ``1/(sqrt(2*pi)*sigma)`` cancels in
the division but is kept for bit-parity of the f64 profile.

For bit-parity we also reproduce the C++ accumulation order exactly:
    result  = img * k[0]
    result += k[u] * (img_shift(+u) + img_shift(-u))   for u = 1..K-1
    result /= sum_w
which vectorizes as K-1 shifted adds per axis — still a fine TPU program for
the small K here (K <= 11 for the SIFT pyramid).  The `fast` path lowers the
same math through a dot with a banded matrix so XLA maps it onto the MXU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from sift_tpu.config import gaussian_half_kernel, half_kernel_weight_sum
from sift_tpu.utils.numerics import xdiv, xmul


def separable_blur(img: jnp.ndarray, half_kernel: list[float]) -> jnp.ndarray:
    """Two-pass 1D convolution matching src/image.cpp:156-214 bit-for-bit.

    ``img`` is (..., H, W); the horizontal pass (along x / axis -1) runs first
    like the reference, then the vertical pass.

    The clamp-at-border taps are one edge-replicate pad + static slices —
    pure data movement (identical values to clamped indexing), which XLA
    fuses into a single elementwise loop; the earlier ``jnp.take`` clamped
    gather lowered to the TPU scalar-gather slow path and dominated pyramid
    time.
    """
    dtype = img.dtype
    k = [jnp.asarray(v, dtype) for v in half_kernel]
    kk = len(half_kernel)
    sum_w = jnp.asarray(half_kernel_weight_sum(half_kernel), dtype)

    def one_axis(a: jnp.ndarray, axis: int) -> jnp.ndarray:
        n = a.shape[axis]
        pad = [(0, 0)] * a.ndim
        pad[axis] = (kk - 1, kk - 1)
        ap = jnp.pad(a, pad, mode="edge")

        def sh(u: int) -> jnp.ndarray:
            return jax.lax.slice_in_dim(ap, kk - 1 + u, kk - 1 + u + n, axis=axis)

        result = xmul(a, k[0])
        for u in range(1, kk):
            result = result + xmul(k[u], sh(u) + sh(-u))
        return xdiv(result, sum_w)

    tmp = one_axis(img, -1)  # horizontal pass (x)
    return one_axis(tmp, -2)  # vertical pass (y)


def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Fast gaussian blur per src/image.cpp:220-238 (kernel size ceil(3*sigma)+1)."""
    return separable_blur(img, gaussian_half_kernel(sigma))


def full_kernel(half_kernel: list[float]) -> np.ndarray:
    """Symmetric full kernel normalized by the reference's sum_w (fast path)."""
    k = np.asarray(half_kernel, np.float64)
    full = np.concatenate([k[:0:-1], k])
    return full / half_kernel_weight_sum(half_kernel)
