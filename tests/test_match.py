"""Matching unit tests: exact top-2 + ratio test vs a numpy brute-force
reference of the C++ loop (src/sift.cpp:783-815), plus the kp-sharded
distributed matcher on a simulated multi-device mesh."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from sift_tpu.models.match import match_descriptors, pairwise_sq_dists


def brute_force(d1, d2, ratio=0.75):
    """Literal transcription of the reference matcher semantics."""
    out = []
    for i in range(len(d1)):
        best = second = np.inf
        bj = 0
        for j in range(len(d2)):
            dist = np.sqrt(((d1[i].astype(int) - d2[j].astype(int)) ** 2).sum())
            if dist < best:
                second = best
                best = dist
                bj = j
            elif dist < second:
                second = dist
        if best < ratio * second:
            out.append((i, bj))
    return set(out)


@pytest.fixture(scope="module")
def descs():
    rng = np.random.default_rng(42)
    d1 = rng.integers(0, 256, (200, 128), dtype=np.uint8)
    d2 = rng.integers(0, 256, (150, 128), dtype=np.uint8)
    # Inject exact duplicates and near-ties to exercise tie-breaking.
    d2[10] = d1[0]
    d2[11] = d1[0]
    d2[20] = d2[21]
    return d1, d2


def test_pairwise_sq_dists_exact(descs):
    d1, d2 = descs
    got = np.asarray(pairwise_sq_dists(jnp.asarray(d1), jnp.asarray(d2)))
    want = (
        (d1.astype(np.int64) ** 2).sum(1)[:, None]
        + (d2.astype(np.int64) ** 2).sum(1)[None, :]
        - 2 * d1.astype(np.int64) @ d2.astype(np.int64).T
    )
    np.testing.assert_array_equal(got, want)


def test_match_vs_bruteforce(descs):
    d1, d2 = descs
    v1 = np.ones(len(d1), bool)
    v2 = np.ones(len(d2), bool)
    idx, accept, best, second = match_descriptors(
        jnp.asarray(d1), jnp.asarray(v1), jnp.asarray(d2), jnp.asarray(v2)
    )
    mine = {(i, int(idx[i])) for i in np.nonzero(np.asarray(accept))[0]}
    assert mine == brute_force(d1, d2)


def test_match_respects_validity(descs):
    d1, d2 = descs
    v1 = np.ones(len(d1), bool)
    v2 = np.ones(len(d2), bool)
    v1[5] = False
    v2[10] = False
    idx, accept, *_ = match_descriptors(
        jnp.asarray(d1), jnp.asarray(v1), jnp.asarray(d2), jnp.asarray(v2)
    )
    accept = np.asarray(accept)
    assert not accept[5]
    assert not np.any(np.asarray(idx)[accept] == 10)
    # Equivalent to brute force on the valid subsets (indices remapped).
    keep2 = np.nonzero(v2)[0]
    want = {
        (i, int(keep2[j]))
        for (i, j) in brute_force(d1, d2[v2])
        if v1[i]
    }
    mine = {(i, int(idx[i])) for i in np.nonzero(accept)[0]}
    assert mine == want


def test_single_target_always_accepts():
    d1 = np.zeros((3, 128), np.uint8)
    d2 = np.full((1, 128), 7, np.uint8)
    idx, accept, *_ = match_descriptors(
        jnp.asarray(d1), jnp.ones(3, bool), jnp.asarray(d2), jnp.ones(1, bool)
    )
    assert np.all(np.asarray(accept))  # DBL_MAX second-best in the reference


def test_empty_target_rejects():
    d1 = np.zeros((3, 128), np.uint8)
    d2 = np.zeros((4, 128), np.uint8)
    idx, accept, *_ = match_descriptors(
        jnp.asarray(d1), jnp.ones(3, bool), jnp.asarray(d2), jnp.zeros(4, bool)
    )
    assert not np.any(np.asarray(accept))


def test_sharded_match_equals_single_device(descs):
    import jax

    from sift_tpu.parallel.dist import sharded_match
    from sift_tpu.parallel.mesh import make_mesh

    d1, d2 = descs
    # Pad B side to a multiple of the kp axis.
    m = 160
    d2p = np.zeros((m, 128), np.uint8)
    d2p[: len(d2)] = d2
    v2 = np.zeros(m, bool)
    v2[: len(d2)] = True
    v1 = np.ones(len(d1), bool)

    ref_idx, ref_acc, ref_b, ref_s = match_descriptors(
        jnp.asarray(d1), jnp.asarray(v1), jnp.asarray(d2p), jnp.asarray(v2)
    )

    for kp_axis in (2, 4, 8):
        mesh = make_mesh(data=1, kp=kp_axis)
        idx, acc, b, s = sharded_match(
            jnp.asarray(d1), jnp.asarray(v1), jnp.asarray(d2p), jnp.asarray(v2),
            mesh,
        )
        np.testing.assert_array_equal(np.asarray(acc), np.asarray(ref_acc))
        np.testing.assert_array_equal(np.asarray(b), np.asarray(ref_b))
        np.testing.assert_array_equal(np.asarray(s), np.asarray(ref_s))
        np.testing.assert_array_equal(
            np.asarray(idx)[np.asarray(acc)], np.asarray(ref_idx)[np.asarray(ref_acc)]
        )


def test_sharded_match_winners_in_every_shard():
    """Global-index reconstruction with winners spread across ALL shards.

    Regression guard: shard widths here (192, 96) differ from the 128-wide
    descriptor dim, and planted best matches land in every shard, so a
    shard-offset mix-up (e.g. multiplying by desc dim instead of shard
    width) flips accepted indices and fails the exact comparison below.
    """
    import jax

    from sift_tpu.parallel.dist import sharded_match
    from sift_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(7)
    n, m = 256, 384  # kp=2 -> width 192; kp=4 -> width 96 (never 128)
    d1 = rng.integers(0, 256, (n, 128)).astype(np.uint8)
    d2 = rng.integers(0, 256, (m, 128)).astype(np.uint8)
    for i in range(0, n, 5):  # plant near-duplicates across the full range
        d2[(i * 3 + 11) % m] = np.clip(
            d1[i].astype(int) + rng.integers(-2, 3, 128), 0, 255
        ).astype(np.uint8)
    v1 = np.ones(n, bool)
    v2 = np.ones(m, bool)

    ref_idx, ref_acc, ref_b, ref_s = match_descriptors(
        jnp.asarray(d1), jnp.asarray(v1), jnp.asarray(d2), jnp.asarray(v2)
    )
    ref_set = {
        (i, int(j))
        for i, j in enumerate(np.asarray(ref_idx))
        if np.asarray(ref_acc)[i]
    }
    assert any(j >= m // 2 for _, j in ref_set), "fixture must span shards"

    for kp_axis in (2, 4):
        mesh = make_mesh(data=1, kp=kp_axis)
        idx, acc, b, s = sharded_match(
            jnp.asarray(d1), jnp.asarray(v1), jnp.asarray(d2), jnp.asarray(v2),
            mesh,
        )
        got = {
            (i, int(j))
            for i, j in enumerate(np.asarray(idx))
            if np.asarray(acc)[i]
        }
        assert got == ref_set
        np.testing.assert_array_equal(np.asarray(b), np.asarray(ref_b))
        np.testing.assert_array_equal(np.asarray(s), np.asarray(ref_s))
