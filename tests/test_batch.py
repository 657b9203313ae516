"""Batched pipeline equals the single-image pipeline."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from sift_tpu import SiftConfig
from sift_tpu.models.sift import detect_and_describe, detect_and_describe_batch


def test_batch_matches_single():
    rng = np.random.default_rng(0)
    imgs = np.stack(
        [rng.uniform(0, 255, (48, 64, 3)) for _ in range(3)]
    ).astype(np.float32)
    # Blur one image so batches carry different content.
    imgs[1] = (imgs[1] + np.roll(imgs[1], 1, axis=0)) / 2

    cfg = SiftConfig(dtype=jnp.float32, extrema_cap=256, kp_cap=128)
    batch = detect_and_describe_batch(imgs, cfg)
    for b in range(3):
        single = detect_and_describe(imgs[b], cfg)
        np.testing.assert_array_equal(
            np.asarray(batch.valid[b]), np.asarray(single.valid)
        )
        v = np.asarray(single.valid)
        for field in ("x", "y", "size", "pori", "octave", "layer"):
            np.testing.assert_array_equal(
                np.asarray(getattr(batch, field)[b])[v],
                np.asarray(getattr(single, field))[v],
                err_msg=field,
            )
        np.testing.assert_array_equal(
            np.asarray(batch.desc[b])[v], np.asarray(single.desc)[v]
        )
