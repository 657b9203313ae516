"""Elastic recovery: losing devices mid-run degrades the mesh, not the
results.  The failure-detection story on real pods is jax.distributed's
heartbeat; here we simulate the recovery path — rebuild a smaller mesh from
the surviving devices, reload checkpointed state, and verify the sharded
computations reproduce the original results exactly."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from sift_tpu.models.match import match_descriptors
from sift_tpu.parallel.ba_dist import (
    shard_ba_problem,
    sharded_ba_step,
)
from sift_tpu.parallel.dist import sharded_match
from sift_tpu.parallel.mesh import make_mesh
from sift_tpu.utils.checkpoint import load_keypoints, save_keypoints
from sift_tpu.utils.keypoints import Keypoints


def test_match_survives_device_loss(tmp_path):
    rng = np.random.default_rng(0)
    d1 = rng.integers(0, 256, (128, 128), dtype=np.uint8)
    d2 = rng.integers(0, 256, (512, 128), dtype=np.uint8)
    v1 = np.ones(128, bool)
    v2 = np.ones(512, bool)

    kp = Keypoints.empty(512)
    kp.desc = jnp.asarray(d2)
    kp.valid = jnp.asarray(v2)
    save_keypoints(str(tmp_path / "state.npz"), kp)

    mesh4 = make_mesh(data=1, kp=4)
    idx4, acc4, b4, s4 = sharded_match(
        jnp.asarray(d1), jnp.asarray(v1), jnp.asarray(d2), jnp.asarray(v2), mesh4
    )

    # "Fail" devices 4..7: rebuild on the surviving front half and reload the
    # checkpointed descriptor state.
    survivors = jax.devices()[:2]
    mesh2 = make_mesh(data=1, kp=2, devices=survivors)
    kp2 = load_keypoints(str(tmp_path / "state.npz"))
    idx2, acc2, b2, s2 = sharded_match(
        jnp.asarray(d1), jnp.asarray(v1), kp2.desc, kp2.valid, mesh2
    )

    np.testing.assert_array_equal(np.asarray(acc4), np.asarray(acc2))
    np.testing.assert_array_equal(np.asarray(b4), np.asarray(b2))
    np.testing.assert_array_equal(
        np.asarray(idx4)[np.asarray(acc4)], np.asarray(idx2)[np.asarray(acc2)]
    )


def test_ba_step_survives_device_loss():
    rng = np.random.default_rng(1)
    n_cams, n_pts = 4, 40
    pts = rng.uniform([-1, -1, 4], [1, 1, 6], (n_pts, 3))
    cams = np.zeros((n_cams, 6))
    cams[:, 3] = 0.1 * np.arange(n_cams)
    obs_cam = np.repeat(np.arange(n_cams, dtype=np.int32), n_pts)
    obs_pt = np.tile(np.arange(n_pts, dtype=np.int32), n_cams)
    uv = []
    for c in range(n_cams):
        pc = pts + cams[c, 3:]
        uv.append(pc[:, :2] / pc[:, 2:] * 100.0 + 50.0)
    obs_uv = np.concatenate(uv)
    fixed = np.zeros(n_cams, bool)
    fixed[:2] = True
    fxy = np.array([100.0, 100.0])
    cxy = np.array([50.0, 50.0])
    pts_noisy = pts + rng.normal(0, 0.01, pts.shape)

    mesh4 = make_mesh(data=1, kp=4)
    sp4, _ = shard_ba_problem(cams, pts_noisy, obs_cam, obs_pt, obs_uv, 4, fxy, cxy, fixed)
    cams4, _, cost4 = sharded_ba_step(sp4, 1e-3, mesh4)

    mesh2 = make_mesh(data=1, kp=2, devices=jax.devices()[:2])
    sp2, _ = shard_ba_problem(cams, pts_noisy, obs_cam, obs_pt, obs_uv, 2, fxy, cxy, fixed)
    cams2, _, cost2 = sharded_ba_step(sp2, 1e-3, mesh2)

    assert abs(float(cost4) - float(cost2)) < 1e-3 * max(float(cost4), 1.0)
    np.testing.assert_allclose(
        np.asarray(cams4), np.asarray(cams2), atol=1e-5
    )
