"""Pallas top-2 matcher equals the XLA matcher (interpret mode on CPU)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from sift_tpu.models.match import match_descriptors
from sift_tpu.ops.pallas_match import match_descriptors_pallas


def test_pallas_match_equals_xla():
    rng = np.random.default_rng(3)
    d1 = rng.integers(0, 256, (300, 128), dtype=np.uint8)
    d2 = rng.integers(0, 256, (700, 128), dtype=np.uint8)
    d2[5] = d1[7]
    d2[600] = d1[7]  # duplicate best in a later block
    v1 = np.ones(300, bool)
    v2 = np.ones(700, bool)
    v2[100:120] = False

    ref_idx, ref_acc, ref_b, ref_s = match_descriptors(
        jnp.asarray(d1), jnp.asarray(v1), jnp.asarray(d2), jnp.asarray(v2)
    )
    idx, acc, b, s = match_descriptors_pallas(
        jnp.asarray(d1), jnp.asarray(v1), jnp.asarray(d2), jnp.asarray(v2),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(b), np.asarray(ref_b))
    np.testing.assert_array_equal(np.asarray(s), np.asarray(ref_s))
    np.testing.assert_array_equal(np.asarray(acc), np.asarray(ref_acc))
    np.testing.assert_array_equal(
        np.asarray(idx)[np.asarray(acc)], np.asarray(ref_idx)[np.asarray(ref_acc)]
    )
