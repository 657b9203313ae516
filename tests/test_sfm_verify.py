"""GRIC H-vs-E geometric verification: behavioral contract on synthetic pairs.

The verifier must remove wrong matches and keep correct ones on three pair
geometries that defeat single-model verification:
  - general 3D parallax (E well-posed; H fits only one plane),
  - a pure planar scene (E degenerate — the round-3 E-only verifier thinned
    good tracks here; H is exact),
  - a zero-baseline revisit (E maximally degenerate; H = identity).
"""

from __future__ import annotations

import numpy as np

from sift_tpu.models.sfm import _geometric_verify

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1.0]])


def _project(pts, r, t):
    pc = pts @ r.T + t
    uv = pc[:, :2] / pc[:, 2:]
    return uv * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _check(uv1, uv2, n_bad, seed=0, noise=0.3):
    rng = np.random.default_rng(seed)
    n = len(uv1)
    uv1 = uv1 + rng.normal(0, noise, uv1.shape)
    uv2 = uv2 + rng.normal(0, noise, uv2.shape)
    # wrong matches: reroute the last n_bad rows to random partners
    m = np.stack([np.arange(n), np.arange(n)], 1)
    bad = np.arange(n - n_bad, n)
    m[bad, 1] = rng.permutation(bad)
    while (m[bad, 1] == bad).any():  # ensure actually wrong
        m[bad, 1] = rng.permutation(bad)
    out = _geometric_verify([uv1, uv2], {(0, 1): m}, K, seed=3)
    kept = out.get((0, 1), np.zeros((0, 2), int))
    kept_good = sum(1 for a, b in kept if a == b)
    kept_bad = len(kept) - kept_good
    n_good = n - n_bad
    return kept_good / n_good, kept_bad / max(n_bad, 1)


def test_verify_parallax_scene():
    rng = np.random.default_rng(1)
    pts = rng.uniform([-2, -2, 3], [2, 2, 9], (120, 3))
    uv1 = _project(pts, np.eye(3), np.zeros(3))
    uv2 = _project(pts, _rot_y(0.05), np.array([-0.4, 0.02, 0.0]))
    good_frac, bad_frac = _check(uv1, uv2, 24)
    assert good_frac > 0.85, good_frac
    assert bad_frac < 0.15, bad_frac


def test_verify_planar_scene():
    """Pure plane: E-RANSAC is degenerate; GRIC must fall back to H and
    still separate good from wrong matches."""
    rng = np.random.default_rng(2)
    pts = np.concatenate(
        [rng.uniform([-2, -2], [2, 2], (120, 2)), np.full((120, 1), 5.0)], 1
    )
    uv1 = _project(pts, np.eye(3), np.zeros(3))
    uv2 = _project(pts, _rot_y(0.08), np.array([-0.5, 0.0, 0.05]))
    good_frac, bad_frac = _check(uv1, uv2, 24)
    assert good_frac > 0.85, good_frac
    assert bad_frac < 0.15, bad_frac


def test_verify_zero_baseline_revisit():
    """Same viewpoint twice (loop closure): round 3 kept these pairs
    UNFILTERED, letting repeated-texture confusions poison tracks.  The H
    path must now filter them."""
    rng = np.random.default_rng(3)
    pts = rng.uniform([-2, -2, 3], [2, 2, 9], (120, 3))
    uv1 = _project(pts, np.eye(3), np.zeros(3))
    good_frac, bad_frac = _check(uv1, uv1.copy(), 24)
    assert good_frac > 0.9, good_frac
    assert bad_frac < 0.1, bad_frac


def test_verify_small_pairs_pass_through():
    uv = np.random.default_rng(4).uniform(0, 100, (10, 2))
    m = np.stack([np.arange(10), np.arange(10)], 1)
    out = _geometric_verify([uv, uv + 5], {(0, 1): m}, K, seed=0)
    np.testing.assert_array_equal(out[(0, 1)], m)


def test_loop_closure_candidates_gap_and_similarity():
    """Retrieval proposals: only frames >= min_gap apart whose global
    descriptors agree closely; near-window and dissimilar frames never
    propose."""
    from sift_tpu.models.sfm import loop_closure_candidates

    rng = np.random.default_rng(0)
    a = rng.normal(size=(40, 128)).astype(np.float32)
    b = rng.normal(size=(40, 128)).astype(np.float32)
    descs = []
    for i in range(12):
        # frames 0..5 share appearance A, 6..11 appearance B, except frame
        # 10 which REVISITS appearance A (plus small noise).
        base = a if (i < 6 or i == 10) else b
        descs.append(
            np.clip(base + rng.normal(0, 0.05, base.shape), -3, 3) * 40 + 120
        )
    cands = loop_closure_candidates(descs, min_gap=8, min_sim=0.95)
    assert all(j - i >= 8 for i, j in cands)
    # the A-revisit must be proposed against an early A frame
    assert any(j == 10 and i < 6 for i, j in cands), cands
    # no A<->B cross proposals
    for i, j in cands:
        ia = i < 6 or i == 10
        ja = j < 6 or j == 10
        assert ia == ja, (i, j)
