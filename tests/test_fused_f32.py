"""f32 fast-profile parity: the fused production batch pipeline must
reproduce the reference's keypoint counts and exact match set on the
CAVE-01 benchmark pair.

The staged f64 profile is bit-audited stage by stage (test_parity_*); this
guards the OTHER production contract — the f32 TPU fast path (flattened
batch lanes, per-chunk window dispatch, exact-int matcher) yields the
reference's 677/1067 keypoints and the identical 165-match set on the
oracle-decoded pixels (src/sift.cpp end-to-end run, tests/oracle/).
Window-size dispatch must not perturb descriptors: shrinking a sample
window only drops exact-zero contributions.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

DATA = "tests/data"


@pytest.mark.slow
def test_fused_f32_reproduces_oracle_match_set():
    from sift_tpu import SiftConfig
    from sift_tpu.models.match import match_descriptors
    from sift_tpu.models.sift import detect_and_describe_batch

    i1 = dict(np.load(f"{DATA}/oracle_cave00.npz"))["input"].astype(np.float32)
    i2 = dict(np.load(f"{DATA}/oracle_cave01.npz"))["input"].astype(np.float32)
    cfg = SiftConfig(
        dtype=jnp.float32, extrema_cap=6144, kp_cap=1536, ori_cap=2048
    )
    kp = detect_and_describe_batch(np.stack([i1, i2]), cfg)
    n1 = int(np.asarray(kp.valid[0]).sum())
    n2 = int(np.asarray(kp.valid[1]).sum())
    assert (n1, n2) == (677, 1067), (n1, n2)

    idx, acc, _, _ = match_descriptors(
        kp.desc[0], kp.valid[0], kp.desc[1], kp.valid[1], cfg.ratio_threshold
    )
    assert int(np.asarray(acc).sum()) == 165
