"""Pallas descriptor-histogram kernel vs the XLA fast path (interpret mode).

The kernel's contract (ops/pallas_desc.py) is ulp-level: identical masks and
trilinear binning, but a polynomial atan2 (~2 ulp) and Mosaic reduction
order.  Quantized u8 descriptors must therefore agree except for rare
off-by-one floor flips.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp


def test_atan2_poly_accuracy():
    from sift_tpu.ops.pallas_desc import atan2_poly

    rng = np.random.default_rng(0)
    y = rng.normal(0, 10, (1 << 14,)).astype(np.float32)
    x = rng.normal(0, 10, (1 << 14,)).astype(np.float32)
    # Axis / degenerate cases.
    y = np.concatenate([y, [0, 0, 1, -1, 0, 1e-30, 1e30]]).astype(np.float32)
    x = np.concatenate([x, [1, -1, 0, 0, 0, 1e30, 1e-30]]).astype(np.float32)
    got = np.asarray(atan2_poly(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y, x)
    # atan2(0, -1): the poly returns +pi, numpy too.
    err = np.abs(got - want)
    err = np.minimum(err, 2 * np.pi - err)  # wrap-equivalent
    assert float(err.max()) < 2e-6, float(err.max())
    assert np.isfinite(got).all()
    # x == y == 0 must be finite (magnitude weight is 0 there).
    assert float(np.asarray(atan2_poly(jnp.zeros(()), jnp.zeros(())))) == 0.0


def _mk_problem(seed: int, n: int, h: int, w: int):
    """Synthetic octave-0 gaussian stack + plausible keypoint buffer."""
    from sift_tpu.utils.keypoints import Keypoints

    rng = np.random.default_rng(seed)
    # Smooth-ish image stack so gradients vary but stay well-scaled.
    base = rng.uniform(0, 255, (h // 4, w // 4)).astype(np.float32)
    img = np.kron(base, np.ones((4, 4), np.float32))
    img += rng.uniform(-3, 3, (h, w)).astype(np.float32)
    gauss = np.stack([np.roll(img, s, axis=1) for s in range(6)])

    # Input-image coords (doubled-image octave 0: pow_denom = 2).
    x = rng.uniform(3, w // 2 - 3, n)
    y = rng.uniform(3, h // 2 - 3, n)
    # Sizes up to the per-layer bound so every dispatch class (including the
    # worst-case window, where the kernel halves its block) is exercised.
    size = rng.uniform(0.8, 1.75, n)
    pori = rng.uniform(0, 2 * np.pi, n)
    valid = rng.uniform(size=n) < 0.9
    kp = Keypoints(
        x=jnp.asarray(x, jnp.float32),
        y=jnp.asarray(y, jnp.float32),
        octave=jnp.zeros(n, jnp.int32),
        layer=jnp.asarray(rng.integers(1, 4, n), jnp.int32),
        size=jnp.asarray(size, jnp.float32),
        pori=jnp.asarray(pori, jnp.float32),
        desc=jnp.zeros((n, 128), jnp.uint8),
        valid=jnp.asarray(valid),
    )
    return jnp.asarray(gauss), kp


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_desc_matches_xla_fast_path(seed):
    from sift_tpu import SiftConfig
    from sift_tpu.models.descriptor import compute_descriptors_all
    from sift_tpu.ops.gather import build_multi_rows

    gauss, kp = _mk_problem(seed, n=128, h=96, w=128)
    cfg = SiftConfig(dtype=jnp.float32)
    mr = build_multi_rows([gauss])

    d_xla = np.asarray(
        compute_descriptors_all(
            mr, kp, cfg, octave_of_volume=(0,), dispatch_radius=True
        )
    )
    d_pl = np.asarray(
        compute_descriptors_all(
            mr, kp, cfg, octave_of_volume=(0,), dispatch_radius=True,
            use_pallas=True,
        )
    )
    valid = np.asarray(kp.valid)
    assert d_pl[~valid].sum() == 0
    diff = np.abs(
        d_xla[valid].astype(np.int32) - d_pl[valid].astype(np.int32)
    )
    # Quantization floor flips from the atan2/reduction ulp differences must
    # be rare and never exceed one level.
    assert diff.max() <= 1, diff.max()
    frac = (diff != 0).mean()
    assert frac < 0.01, frac
    # The descriptors must be non-trivial (histograms actually populated).
    assert d_xla[valid].astype(np.int32).sum() > 0


def test_pallas_orient_matches_xla_fast_path():
    from sift_tpu import SiftConfig
    from sift_tpu.models.orient import orient_all
    from sift_tpu.ops.gather import build_multi_rows

    gauss, kp = _mk_problem(7, n=128, h=96, w=128)
    cfg = SiftConfig(dtype=jnp.float32)
    mr = build_multi_rows([gauss])

    c_xla = orient_all(
        mr, kp, cfg, octave_of_volume=(0,), dispatch_radius=True
    )
    c_pl = orient_all(
        mr, kp, cfg, octave_of_volume=(0,), dispatch_radius=True,
        use_pallas=True,
    )
    v1 = np.asarray(c_xla.valid)
    v2 = np.asarray(c_pl.valid)
    # Peak sets may differ only where a histogram value sits within ulps of
    # the 0.8*max threshold; on random data that must be rare.
    assert (v1 != v2).mean() < 0.005, (v1 != v2).mean()
    both = v1 & v2
    assert both.sum() > 0
    dp = np.abs(np.asarray(c_xla.pori)[both] - np.asarray(c_pl.pori)[both])
    dp = np.minimum(dp, 2 * np.pi - dp)
    assert float(dp.max()) < 1e-3, float(dp.max())
