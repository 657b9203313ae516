"""Color conversions.

TPU-native rebuild of the reference's grayscale conversion
(/root/reference/src/image.cpp:8-24): BT.709 luma with the exact same
left-associative accumulation order so the f64 parity profile is bit-faithful.
"""

from __future__ import annotations

import jax.numpy as jnp

from sift_tpu.utils.numerics import xmul


def to_grayscale(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, C) -> (..., H, W) BT.709 luma; pass-through if C == 1.

    Pixel values are kept in [0, 255] like the reference's double store.
    """
    if img.ndim >= 3 and img.shape[-1] == 1:
        return img[..., 0]
    if img.ndim == 2:
        return img
    r = img[..., 0]
    g = img[..., 1]
    b = img[..., 2]
    # C++ evaluation order: (0.2126*r + 0.7152*g) + 0.0722*b
    return (xmul(0.2126, r) + xmul(0.7152, g)) + xmul(0.0722, b)
