"""General 2D convolution (reference L2 completeness).

Rebuild of apply_convolution (src/image.cpp:94-121): generic square-kernel
2D convolution with zero padding, as one XLA conv that maps onto the MXU.
The reference's apply_gaussian_blur (src/image.cpp:127-150) builds a 2D
gaussian kernel and calls this; note its normalization loop divides only the
first ``kernel_size`` taps (src/image.cpp:145-147) — a latent bug in dead
code (the live pipeline only uses the separable fast blur), which we do NOT
replicate: ``gaussian_kernel_2d`` normalizes correctly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def apply_convolution(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) (x) (k, k) -> (..., H, W), zero padding (src/image.cpp:108).

    Follows the reference's index convention: out[x, y] = sum_{u,v}
    img[x+u, y+v] * kernel[u+r, v+r], i.e. cross-correlation with the first
    kernel axis along x (columns).
    """
    k = jnp.asarray(kernel, img.dtype)
    batch_shape = img.shape[:-2]
    x = img.reshape((-1, 1) + img.shape[-2:])
    # Reference kernel[u][v]: u runs along x (width). Our array is (H, W) so
    # the kernel applied over (H, W) needs axes (v, u) -> transpose.
    kt = k.T[None, None]
    out = jax.lax.conv_general_dilated(
        x, kt, (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out.reshape(batch_shape + img.shape[-2:])


def gaussian_kernel_2d(sigma: float) -> np.ndarray:
    """Normalized 2D gaussian, size 2*ceil(3*sigma)+1 (src/image.cpp:128)."""
    size = 2 * int(math.ceil(3 * sigma)) + 1
    r = size // 2
    xs = np.arange(size) - r
    g = np.exp(-(xs[:, None] ** 2 + xs[None, :] ** 2) / (2 * sigma * sigma))
    g /= 2 * math.pi * sigma * sigma
    return g / g.sum()


def subtract(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise img1 - img2 (src/image.cpp:30-36); DoG values go negative
    and are never clamped."""
    return img1 - img2
