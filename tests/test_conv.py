"""Generic 2D convolution vs a literal transcription of the reference loop."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from sift_tpu.ops.conv import apply_convolution, gaussian_kernel_2d, subtract


def reference_conv(img, kernel):
    """Literal apply_convolution (src/image.cpp:94-121): img indexed (x, y)."""
    ks = kernel.shape[0]
    r = ks // 2
    h, w = img.shape
    out = np.zeros_like(img)
    for x in range(w):
        for y in range(h):
            acc = 0.0
            for u in range(-r, r + 1):
                for v in range(-r, r + 1):
                    xx, yy = x + u, y + v
                    if 0 <= xx < w and 0 <= yy < h:
                        acc += img[yy, xx] * kernel[u + r, v + r]
            out[y, x] = acc
    return out


def test_apply_convolution_matches_reference_loop():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (12, 17))
    kernel = rng.uniform(-1, 1, (5, 5))
    got = np.asarray(apply_convolution(jnp.asarray(img), jnp.asarray(kernel)))
    want = reference_conv(img, kernel)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9)


def test_gaussian_kernel_normalized():
    g = gaussian_kernel_2d(1.6)
    assert g.shape == (11, 11)
    assert abs(g.sum() - 1.0) < 1e-12


def test_subtract():
    a = jnp.asarray([[2.0, 3.0]])
    b = jnp.asarray([[5.0, 1.0]])
    np.testing.assert_array_equal(np.asarray(subtract(a, b)), [[-3.0, 2.0]])
