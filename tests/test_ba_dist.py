"""Distributed BA: point-sharded Schur + psum equals the single-device solver
and converges on a simulated multi-device mesh."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from sift_tpu.models.ba import BAProblem, ba_solve, build_obs_by_point
from sift_tpu.parallel.ba_dist import (
    shard_ba_problem,
    sharded_ba_solve,
    sharded_cost,
)
from sift_tpu.parallel.mesh import make_mesh


def _scene():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_sfm import make_scene

    pts, poses, k, obs = make_scene(n_cams=5, noise=0.3, seed=3)
    rng = np.random.default_rng(7)
    cams = np.zeros((5, 6))
    for i, (r, t) in enumerate(poses):
        cos = np.clip((np.trace(r) - 1) / 2, -1, 1)
        th = np.arccos(cos)
        ax = np.array([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]])
        ax = ax / max(np.linalg.norm(ax), 1e-12)
        cams[i, :3] = ax * th
        cams[i, 3:] = t
    cams_noisy = cams.copy()
    cams_noisy[2:] += rng.normal(0, 0.03, cams_noisy[2:].shape)
    pts_noisy = pts + rng.normal(0, 0.05, pts.shape)
    fixed = np.zeros(5, bool)
    fixed[:2] = True
    return cams, cams_noisy, pts, pts_noisy, obs, fixed


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_ba_matches_single_device(n_shards):
    cams_gt, cams, pts_gt, pts, obs, fixed = _scene()
    obs_cam = obs[:, 0].astype(np.int32)
    obs_pt = obs[:, 1].astype(np.int32)
    obs_uv = obs[:, 2:]
    fxy = np.array([500.0, 500.0])
    cxy = np.array([320.0, 240.0])

    # Single-device reference.
    tbl = build_obs_by_point(obs_pt, len(pts))
    pr = BAProblem(
        cams=jnp.asarray(cams, jnp.float32),
        points=jnp.asarray(pts, jnp.float32),
        obs_cam=jnp.asarray(obs_cam),
        obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(obs_uv, jnp.float32),
        obs_mask=jnp.ones(len(obs_cam), bool),
        obs_by_point=jnp.asarray(tbl),
        fxy=jnp.asarray(fxy, jnp.float32),
        cxy=jnp.asarray(cxy, jnp.float32),
        fixed_cams=jnp.asarray(fixed),
    )
    cams_ref, _, info_ref = ba_solve(pr, iters=12)

    mesh = make_mesh(data=1, kp=n_shards)
    sp, _ = shard_ba_problem(
        cams, pts, obs_cam, obs_pt, obs_uv, n_shards, fxy, cxy, fixed
    )
    cost0 = float(sharded_cost(sp, mesh))
    assert abs(cost0 - info_ref["cost_trace"][0]) < 1e-2 * cost0

    sp_out, info = sharded_ba_solve(sp, mesh, iters=12)
    # Same optimum (within f32 reduction-order noise).
    assert info["cost_trace"][-1] < info_ref["cost_trace"][0] * 0.05
    rel = abs(info["cost_trace"][-1] - info_ref["cost_trace"][-1]) / max(
        info_ref["cost_trace"][-1], 1e-6
    )
    assert rel < 0.05
    np.testing.assert_allclose(
        np.asarray(sp_out["cams"]), np.asarray(cams_ref), atol=5e-3
    )
