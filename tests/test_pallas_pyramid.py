"""Fused multi-sigma octave kernel vs the XLA blur chain (interpret mode)."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.mark.parametrize("hw", [(96, 128), (67, 257)])
def test_fused_octave_matches_xla_chain(hw):
    from sift_tpu import SiftConfig
    from sift_tpu.config import gaussian_half_kernel
    from sift_tpu.ops.blur import separable_blur
    from sift_tpu.ops.pallas_pyramid import fused_octave_blur, fused_octave_fits

    h, w = hw
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (2, h, w)).astype(np.float32))

    cfg = SiftConfig()
    hks = [gaussian_half_kernel(s) for s in cfg.gaussian_kernels()[1:]]
    assert fused_octave_fits(img.shape, hks)

    gauss, dogs = fused_octave_blur(img, hks, interpret=True)

    ref = img
    for i, hk in enumerate(hks):
        nxt = separable_blur(ref, hk)
        np.testing.assert_allclose(
            np.asarray(gauss[i]), np.asarray(nxt), rtol=0, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(dogs[i]), np.asarray(gauss[i] - ref), rtol=0, atol=0
        )
        ref = gauss[i]  # chain on the kernel's own output: isolates per-layer error


def test_build_pyramids_fused_flag():
    """The config flag routes whole-pyramid construction through the kernel
    and stays within ulps of the XLA chain at every octave."""
    import jax

    from sift_tpu import SiftConfig
    from sift_tpu.models.pyramid import build_pyramids, compute_initial_image

    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 255, (2, 48, 64, 3)).astype(np.float32))
    cfg = SiftConfig()
    cfg_pl = __import__("dataclasses").replace(cfg, use_pallas_pyramid=True)
    octaves = cfg.octaves_count(64 * 2, 48 * 2)
    initial = compute_initial_image(img, cfg)
    g1, d1 = build_pyramids(initial, cfg, octaves)
    g2, d2 = build_pyramids(initial, cfg_pl, octaves)
    assert len(g1) == len(g2) == octaves
    for a, b in zip(g1 + d1, g2 + d2):
        assert a.shape == b.shape
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2e-4
        )
    assert jax.default_backend() == "cpu"  # interpret-mode run


def test_fused_octave_single_image():
    from sift_tpu import SiftConfig
    from sift_tpu.config import gaussian_half_kernel
    from sift_tpu.ops.blur import separable_blur
    from sift_tpu.ops.pallas_pyramid import fused_octave_blur

    cfg = SiftConfig()
    hks = [gaussian_half_kernel(s) for s in cfg.gaussian_kernels()[1:]]
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 255, (48, 160)).astype(np.float32))
    gauss, dogs = fused_octave_blur(img, hks, interpret=True)
    want = separable_blur(img, hks[0])
    np.testing.assert_allclose(
        np.asarray(gauss[0]), np.asarray(want), rtol=0, atol=1e-4
    )
    assert gauss[0].shape == img.shape and len(gauss) == len(dogs) == 5
