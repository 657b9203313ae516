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

import jax.numpy as jnp
import numpy as np

from sift_tpu.config import gaussian_half_kernel, half_kernel_weight_sum
from sift_tpu.utils.numerics import xdiv, xmul


def _shift_clamped(img: jnp.ndarray, u: int, axis: int) -> jnp.ndarray:
    """img indexed at position i+u with index clamped to [0, n-1] along axis."""
    n = img.shape[axis]
    idx = np.clip(np.arange(n) + u, 0, n - 1)
    return jnp.take(img, jnp.asarray(idx), axis=axis)


def separable_blur(img: jnp.ndarray, half_kernel: list[float]) -> jnp.ndarray:
    """Two-pass 1D convolution matching src/image.cpp:156-214 bit-for-bit.

    ``img`` is (..., H, W); the horizontal pass (along x / axis -1) runs first
    like the reference, then the vertical pass.
    """
    dtype = img.dtype
    k = [jnp.asarray(v, dtype) for v in half_kernel]
    sum_w = jnp.asarray(half_kernel_weight_sum(half_kernel), dtype)

    def one_axis(a: jnp.ndarray, axis: int) -> jnp.ndarray:
        result = xmul(a, k[0])
        for u in range(1, len(k)):
            result = result + xmul(
                k[u], _shift_clamped(a, u, axis) + _shift_clamped(a, -u, axis)
            )
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
