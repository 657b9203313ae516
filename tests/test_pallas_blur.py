"""Pallas blur kernel equals the XLA separable blur (interpret mode)."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from sift_tpu.config import gaussian_half_kernel
from sift_tpu.ops.blur import separable_blur
from sift_tpu.ops.pallas_blur import pallas_blur_fits, pallas_separable_blur


@pytest.mark.parametrize("shape", [(64, 96), (47, 130)])
@pytest.mark.parametrize("sigma", [1.2, 3.09002])
def test_pallas_blur_matches_xla(shape, sigma):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, shape), jnp.float32)
    k = gaussian_half_kernel(sigma)
    ref = np.asarray(separable_blur(img, k))
    got = np.asarray(pallas_separable_blur(img, k, interpret=True))
    # same accumulation order and true division; only FMA-contraction
    # differences in the compiled elementwise chain remain (last ulp)
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-4)


def test_pallas_blur_batched():
    """(B, H, W) input grids over the batch and equals per-image results."""
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(0, 255, (3, 40, 72)), jnp.float32)
    k = gaussian_half_kernel(1.6)
    got = np.asarray(pallas_separable_blur(imgs, k, interpret=True))
    for b in range(3):
        np.testing.assert_allclose(
            got[b], np.asarray(separable_blur(imgs[b], k)),
            rtol=2e-6, atol=2e-4,
        )


def test_fits_predicate():
    # Strip kernels grid over the non-convolved axis, so ordinary large
    # images fit; only a pathologically tall column block can overflow.
    assert pallas_blur_fits((960, 1280))
    assert pallas_blur_fits((4000, 4000))
    assert not pallas_blur_fits((40000, 128))
