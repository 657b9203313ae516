"""Property tests (SURVEY section 4.4): descriptor invariances and matcher
symmetry on real image content."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from sift_tpu import SiftConfig, detect_and_describe, match_descriptors
from sift_tpu.utils.io import load_image

CAVE = "/root/reference/stitching/collection/Dataset/CAVE-01_atrium"

CFG = SiftConfig(dtype=jnp.float32, extrema_cap=2048, kp_cap=1024, ori_cap=2048)


@pytest.fixture(scope="module")
def patch():
    return load_image(f"{CAVE}/05.jpg")[96:416, 160:480]  # 320x320 textured


def _match_pairs(kp1, kp2, ratio=0.75):
    idx, acc, _, _ = match_descriptors(kp1.desc, kp1.valid, kp2.desc, kp2.valid, ratio)
    acc = np.asarray(acc)
    idx = np.asarray(idx)
    rows = np.nonzero(acc)[0]
    return rows, idx[rows]


def test_rotation_90_invariance(patch):
    """90-degree rotation: most keypoints re-match at the rotated location."""
    kp1 = detect_and_describe(patch, CFG)
    rot = np.ascontiguousarray(np.rot90(patch))  # CCW
    kp2 = detect_and_describe(rot, CFG)
    rows, cols = _match_pairs(kp1, kp2)
    n1 = int(kp1.count())
    assert len(rows) > 0.5 * min(n1, int(kp2.count())), (len(rows), n1)

    # Matched coordinates must satisfy the rotation mapping:
    # np.rot90 (CCW): out[y', x'] = in[x', W-1-y']  =>  x2 = y1, y2 = W-1-x1.
    w = patch.shape[1]
    x1 = np.asarray(kp1.x)[rows]
    y1 = np.asarray(kp1.y)[rows]
    x2 = np.asarray(kp2.x)[cols]
    y2 = np.asarray(kp2.y)[cols]
    err = np.hypot(x2 - y1, y2 - (w - 1 - x1))
    assert np.median(err) < 1.5, np.median(err)


def test_scale_invariance(patch):
    """2x upscaled image: matches land at ~2x coordinates, sizes ~2x."""
    kp1 = detect_and_describe(patch, CFG)
    big = np.kron(patch, np.ones((2, 2, 1), np.float32)) / 1.0
    big = np.asarray(
        jnp.asarray(big, jnp.float32)
    )  # nearest 2x upsample keeps content
    # Caps are GLOBAL (all octaves) in the fused path; the 4x-area upscale
    # needs ~4x the extremum capacity of the 320x320 patch.
    big_cfg = SiftConfig(
        dtype=jnp.float32, extrema_cap=8192, kp_cap=2048, ori_cap=4096
    )
    kp2 = detect_and_describe(big, big_cfg)
    rows, cols = _match_pairs(kp1, kp2)
    assert len(rows) > 0.3 * int(kp1.count()), len(rows)
    x1 = np.asarray(kp1.x)[rows]
    y1 = np.asarray(kp1.y)[rows]
    x2 = np.asarray(kp2.x)[cols]
    y2 = np.asarray(kp2.y)[cols]
    err = np.hypot(x2 - 2 * x1, y2 - 2 * y1)
    assert np.median(err) < 4.0, np.median(err)
    s1 = np.asarray(kp1.size)[rows]
    s2 = np.asarray(kp2.size)[cols]
    ratio = np.median(s2 / np.maximum(s1, 1e-6))
    assert 1.6 < ratio < 2.4, ratio


def test_match_symmetry_bound(patch):
    """One-directional ratio matching: the reverse direction agrees on most
    pairs (mutual consistency of the matcher, not exact symmetry)."""
    a = patch
    b = np.ascontiguousarray(patch[:, 8:])  # shifted crop
    kp1 = detect_and_describe(a, CFG)
    kp2 = detect_and_describe(b, CFG)
    rows_f, cols_f = _match_pairs(kp1, kp2)
    rows_b, cols_b = _match_pairs(kp2, kp1)
    fwd = set(zip(rows_f.tolist(), cols_f.tolist()))
    bwd = set(zip(cols_b.tolist(), rows_b.tolist()))
    inter = len(fwd & bwd)
    assert inter > 0.6 * min(len(fwd), len(bwd)), (inter, len(fwd), len(bwd))
