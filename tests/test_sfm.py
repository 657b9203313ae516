"""SfM geometry + bundle adjustment tests on synthetic scenes with ground
truth: essential-matrix recovery, PnP, triangulation, Schur-complement BA
convergence, and end-to-end incremental SfM ATE."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from sift_tpu.models.ba import BAProblem, ba_solve, build_obs_by_point
from sift_tpu.models.geometry import (
    ransac_essential,
    ransac_pnp,
    recover_pose,
    rodrigues,
    triangulate,
)
from sift_tpu.models.sfm import run_sfm_from_matches


def _rot(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    return np.asarray(rodrigues(jnp.asarray(axis * angle)))


def make_scene(n_pts=400, n_cams=6, noise=0.0, seed=0):
    """Points in a box, cameras on an arc looking at the origin region."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2, -2, 4], [2, 2, 8], (n_pts, 3))
    poses = []
    for i in range(n_cams):
        ang = 0.15 * i
        r = _rot([0, 1, 0], ang)
        c = np.array([2.0 * np.sin(ang * 1.5), 0.2 * i, -0.5 * i * 0])
        t = -r @ c
        poses.append((r, t))
    k = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    obs = []  # (cam, pt, u, v)
    for ci, (r, t) in enumerate(poses):
        pc = pts @ r.T + t
        uv = pc[:, :2] / pc[:, 2:]
        uvp = uv * [k[0, 0], k[1, 1]] + [k[0, 2], k[1, 2]]
        uvp = uvp + rng.normal(0, noise, uvp.shape)
        vis = (pc[:, 2] > 0.2) & (np.abs(uvp[:, 0] - 320) < 400) & (
            np.abs(uvp[:, 1] - 240) < 300
        )
        for pi in np.nonzero(vis)[0]:
            obs.append((ci, pi, uvp[pi, 0], uvp[pi, 1]))
    return pts, poses, k, np.asarray(obs)


def test_essential_and_pose_recovery():
    pts, poses, k, obs = make_scene(n_cams=2)
    r_gt, t_gt = poses[1]
    o0 = obs[obs[:, 0] == 0]
    o1 = obs[obs[:, 0] == 1]
    common = np.intersect1d(o0[:, 1], o1[:, 1]).astype(int)
    d0 = {int(r[1]): r[2:] for r in o0}
    d1 = {int(r[1]): r[2:] for r in o1}
    n = 512
    p1 = np.zeros((n, 2))
    p2 = np.zeros((n, 2))
    v = np.zeros(n, bool)
    for i, pid in enumerate(common[:n]):
        p1[i] = (d0[pid] - [320, 240]) / 500.0
        p2[i] = (d1[pid] - [320, 240]) / 500.0
        v[i] = True
    e, inl, cnt = ransac_essential(
        jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32), jnp.asarray(v), 512
    )
    assert int(cnt) > 0.9 * v.sum()
    r, t, front = recover_pose(e, jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32), inl)
    r = np.asarray(r, np.float64)
    t = np.asarray(t, np.float64)
    assert np.abs(r - r_gt).max() < 2e-2
    t_dir = t / np.linalg.norm(t)
    t_gt_dir = t_gt / np.linalg.norm(t_gt)
    assert np.abs(t_dir - t_gt_dir).max() < 2e-2
    # Triangulation reproduces the scene up to the scale |t_gt|.
    x = np.asarray(
        triangulate(
            jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32),
            jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
            jnp.asarray(r, jnp.float32), jnp.asarray(t, jnp.float32),
        ),
        np.float64,
    )
    scale = np.linalg.norm(t_gt)
    for i, pid in enumerate(common[:32]):
        assert np.abs(x[i] * scale - pts[pid]).max() < 0.05


def test_pnp():
    pts, poses, k, obs = make_scene(n_cams=3)
    r_gt, t_gt = poses[2]
    o = obs[obs[:, 0] == 2]
    n = 512
    X = np.zeros((n, 3))
    x = np.zeros((n, 2))
    v = np.zeros(n, bool)
    for i, row in enumerate(o[:n]):
        X[i] = pts[int(row[1])]
        x[i] = (row[2:] - [320, 240]) / 500.0
        v[i] = True
    rvec, tvec, inl, cnt = ransac_pnp(
        jnp.asarray(X, jnp.float32), jnp.asarray(x, jnp.float32), jnp.asarray(v), 512
    )
    r = np.asarray(rodrigues(rvec), np.float64)
    assert int(cnt) > 0.9 * v.sum()
    assert np.abs(r - r_gt).max() < 1e-2
    assert np.abs(np.asarray(tvec) - t_gt).max() < 2e-2


def test_ba_converges():
    pts, poses, k, obs = make_scene(n_cams=5, noise=0.3, seed=3)
    n_cams = 5
    rng = np.random.default_rng(7)
    cams = np.zeros((n_cams, 6))
    for i, (r, t) in enumerate(poses):
        cos = np.clip((np.trace(r) - 1) / 2, -1, 1)
        th = np.arccos(cos)
        ax = np.array([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]])
        ax = ax / max(np.linalg.norm(ax), 1e-12)
        cams[i, :3] = ax * th
        cams[i, 3:] = t
    # Perturb everything except the two gauge cameras.
    cams_noisy = cams.copy()
    cams_noisy[2:] += rng.normal(0, 0.03, cams_noisy[2:].shape)
    pts_noisy = pts + rng.normal(0, 0.05, pts.shape)

    obs_cam = obs[:, 0].astype(np.int32)
    obs_pt = obs[:, 1].astype(np.int32)
    obs_uv = obs[:, 2:]
    fixed = np.zeros(n_cams, bool)
    fixed[:2] = True
    tbl = build_obs_by_point(obs_pt, len(pts))
    pr = BAProblem(
        cams=jnp.asarray(cams_noisy, jnp.float32),
        points=jnp.asarray(pts_noisy, jnp.float32),
        obs_cam=jnp.asarray(obs_cam),
        obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(obs_uv, jnp.float32),
        obs_mask=jnp.ones(len(obs_cam), bool),
        obs_by_point=jnp.asarray(tbl),
        fxy=jnp.asarray([500.0, 500.0], jnp.float32),
        cxy=jnp.asarray([320.0, 240.0], jnp.float32),
        fixed_cams=jnp.asarray(fixed),
    )
    cams_opt, pts_opt, info = ba_solve(pr, iters=15)
    trace = info["cost_trace"]
    assert trace[-1] < trace[0] * 0.05
    # Mean reprojection error ~ noise level (0.3 px).
    n_obs = len(obs_cam)
    rms = np.sqrt(trace[-1] / (2 * n_obs))
    assert rms < 0.6
    # Camera translations recovered to within a few cm.
    err = np.abs(np.asarray(cams_opt, np.float64)[2:, 3:] - cams[2:, 3:]).max()
    assert err < 0.05


def test_incremental_sfm_ate():
    pts, poses, k, obs = make_scene(n_pts=500, n_cams=8, noise=0.2, seed=5)
    # Build per-frame keypoint lists + consecutive-pair matches from obs.
    n_cams = 8
    feats = [[] for _ in range(n_cams)]
    feat_of = {}
    for ci, pi, u, v in obs:
        ci, pi = int(ci), int(pi)
        feat_of[(ci, pi)] = len(feats[ci])
        feats[ci].append([u, v])
    uvs = [np.asarray(f) for f in feats]
    pair_matches = {}
    for i in range(n_cams - 1):
        j = i + 1
        m = []
        for pi in range(len(pts)):
            if (i, pi) in feat_of and (j, pi) in feat_of:
                m.append([feat_of[(i, pi)], feat_of[(j, pi)]])
        pair_matches[(i, j)] = np.asarray(m)

    res = run_sfm_from_matches(uvs, pair_matches, k, ba_iters=20)
    assert res.info["n_points"] > 200

    # ATE vs ground-truth camera centers (same gauge: frames 0, 1 fixed,
    # scale set by the two-view init which is only direction-true) —
    # align with a similarity (Umeyama) before comparing.
    centers_gt = np.stack([-(r.T @ t) for r, t in poses])
    centers = np.stack(
        [
            -(np.asarray(rodrigues(jnp.asarray(res.poses[i, :3]))).T @ res.poses[i, 3:])
            for i in range(n_cams)
        ]
    )
    mu_g = centers_gt.mean(0)
    mu_e = centers.mean(0)
    gc = centers_gt - mu_g
    ec = centers - mu_e
    cov = gc.T @ ec / n_cams
    u, s, vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(u @ vt))
    D = np.diag([1, 1, d])
    rot = u @ D @ vt
    scale = np.trace(np.diag(s) @ D) / (ec**2).sum() * n_cams
    aligned = scale * ec @ rot.T + mu_g
    ate = np.sqrt(((aligned - centers_gt) ** 2).sum(1).mean())
    span = np.linalg.norm(centers_gt.max(0) - centers_gt.min(0))
    assert ate < 0.05 * span, f"ATE {ate} vs span {span}"


def test_pose_graph_relax_closes_drifted_chain():
    """A chain whose second half drifts in scale is pulled back by dense
    center-coincidence closures (pass-1/pass-2 revisit structure), while
    sequential between-factors keep the local steps: closure gaps shrink
    by >5x without distorting the first (trusted) half's step lengths."""
    from sift_tpu.models.sfm import pose_graph_relax

    n = 20
    poses = np.zeros((n, 6))
    # Pass 1: frames 0..9 at x = 0.1 * i.  Pass 2: frames 10..19 REVISIT
    # x = 0.9 - 0.1 * (i - 10) but with 30% scale drift.
    for i in range(10):
        poses[i, 3:] = -np.array([0.1 * i, 0.0, 0.0])
    for i in range(10, 20):
        poses[i, 3:] = -np.array([0.9 - 0.13 * (i - 10), 0.0, 0.0])
    closures = [(i, 19 - i + 0, np.eye(3)) for i in range(4, 9)]
    out = pose_graph_relax(poses, list(range(n)), closures, n_iters=25)

    from sift_tpu.models.geometry import rodrigues

    def centers(p):
        r = np.asarray(rodrigues(jnp.asarray(p[:, :3], jnp.float32)))
        return -np.einsum("nij,nj->ni", r.transpose(0, 2, 1), p[:, 3:])

    c0, c1 = centers(poses), centers(out)
    gap0 = np.mean([np.linalg.norm(c0[i] - c0[19 - i]) for i in range(4, 9)])
    gap1 = np.mean([np.linalg.norm(c1[i] - c1[19 - i]) for i in range(4, 9)])
    assert gap1 < gap0 / 5.0, (gap0, gap1)
    # trusted half's steps survive (within 20%)
    steps = np.linalg.norm(np.diff(c1[:9], axis=0), axis=1)
    assert np.all(np.abs(steps - 0.1) < 0.02), steps


def test_fill_unregistered_by_interpolation():
    """Interior gaps lerp between neighbors; trailing frames extrapolate
    the last registered step; far-from-registered frames stay untouched."""
    from sift_tpu.models.sfm import _fill_unregistered_by_interpolation
    from sift_tpu.models.geometry import rodrigues

    n = 12
    poses = np.zeros((n, 6))
    for i in range(n):
        poses[i, 3:] = -np.array([0.5 * i, 0.0, 0.0])
    reg = [0, 1, 2, 5, 6, 7]  # gap 3-4 interior, 8..11 trailing
    out, filled = _fill_unregistered_by_interpolation(poses, reg, n,
                                                      max_dist=3)
    assert set(filled) == {3, 4, 8, 9, 10}, filled  # 11 is 4 > max_dist away

    def center(p):
        r = np.asarray(rodrigues(jnp.asarray(p[:3], jnp.float32)))
        return -(r.T @ p[3:])

    np.testing.assert_allclose(center(out[3])[0], 1.5, atol=1e-5)
    np.testing.assert_allclose(center(out[4])[0], 2.0, atol=1e-5)
    np.testing.assert_allclose(center(out[9])[0], 4.5, atol=1e-5)
    # untouched: frame 11 still at the origin-pose default
    np.testing.assert_array_equal(out[11], poses[11])
