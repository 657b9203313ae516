"""Spatial (row-sharded) single-image detection vs the single-device pipeline.

The row bands + halo windows must reproduce the staged pipeline's keypoint
set: counts equal and every keypoint 1:1-matched within compile-fusion ulps
(the two programs compile with different shapes/fusions, so f32 coordinates
wiggle in the 4th decimal; debugged set diff was exactly that, nothing
structural).  See parallel/spatial.py for the two documented
beyond-practical-reach deviations.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

DATA = "tests/data"


def _cols(kp):
    v = np.asarray(kp.valid)
    return (
        np.stack(
            [np.asarray(a)[v].astype(np.float64)
             for a in (kp.x, kp.y, kp.size, kp.pori)],
            axis=1,
        ),
        np.asarray(kp.octave)[v],
        np.asarray(kp.desc)[v],
    )


@pytest.mark.slow
def test_spatial_matches_single_device():
    from sift_tpu import SiftConfig
    from sift_tpu.models.sift import detect_stages
    from sift_tpu.parallel.spatial import spatial_detect_and_describe

    img = dict(np.load(f"{DATA}/oracle_cave00.npz"))["input"][::2, ::2]
    img = img.astype(np.float32)

    cfg = SiftConfig(dtype=jnp.float32, extrema_cap=2048, kp_cap=1024,
                     ori_cap=2048)
    # d=4 covers interior shards, both true-border shards, and the
    # replicated-tail octaves in one run.
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))

    kp_sp = spatial_detect_and_describe(img, cfg, mesh)

    h, w = img.shape[:2]
    octaves = cfg.octaves_count(w * 2, h * 2)
    ref = detect_stages(jnp.asarray(img, jnp.float32), cfg, octaves)["final"]

    a, oct_a, desc_a = _cols(kp_sp)
    b, oct_b, desc_b = _cols(ref)
    assert len(b) > 50
    assert len(a) == len(b), (len(a), len(b))

    # 1:1 matching under a ulp-scale tolerance: for every ref keypoint there
    # is exactly one spatial keypoint within (dx, dy, dsize, dpori) bounds
    # and the same octave, and the assignment is a bijection.
    tol = np.array([2e-3, 2e-3, 2e-3, 1e-3])
    close = (np.abs(a[None, :, :] - b[:, None, :]) <= tol).all(-1) & (
        oct_a[None, :] == oct_b[:, None]
    )
    n_match = close.any(axis=1).sum()
    assert n_match == len(b), (len(b) - n_match, len(b))
    # Bijection: greedy row-by-row unique assignment must cover everything.
    assign = close.argmax(axis=1)
    assert len(set(assign.tolist())) == len(b)

    # Descriptors of matched keypoints agree up to rare +-1 quantization
    # flips (coordinate/pori ulps shift the trilinear weights slightly).
    d = np.abs(
        desc_a[assign].astype(np.int32) - desc_b.astype(np.int32)
    )
    assert float((d > 2).mean()) < 0.001, float((d > 2).mean())
    assert float((d != 0).mean()) < 0.05, float((d != 0).mean())
