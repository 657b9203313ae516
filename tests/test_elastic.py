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


def test_scene_resume_after_device_loss(tmp_path):
    """END-TO-END elastic recovery (round-3 verdict item 7): a scene render
    is interrupted by losing half the mesh mid-job; the job resumes from its
    checkpoints (the render_scene.py --cache pattern: save_keypoints per
    frame) on the surviving devices and produces a BYTE-IDENTICAL panorama.

    Distributed pieces exercised across the failure: per-frame detection
    checkpoints, kp-sharded matching on the degraded mesh (tie-exact by
    construction, so the match sets — and therefore the seeded RANSAC
    homographies and the composite — cannot drift).
    """
    from sift_tpu import SiftConfig
    from sift_tpu.models.stitch import (
        composite,
        ransac_homography,
    )
    from sift_tpu.models.sift import detect_and_describe
    from sift_tpu.utils.io import load_image

    tex = load_image(
        "/root/reference/stitching/collection/Dataset/CAVE-01_atrium/05.jpg"
    )
    crops = [tex[:, 0:360], tex[:, 140:500], tex[:, 280:640]]
    cfg = SiftConfig(dtype=jnp.float32, extrema_cap=1024, kp_cap=512,
                     ori_cap=2048)

    def detect_ckpt(i):
        kp = detect_and_describe(crops[i], cfg)
        save_keypoints(str(tmp_path / f"kp_{i:02d}.npz"), kp)
        return kp

    def finish(kps, mesh):
        """Match edges on the given mesh, solve homographies, composite."""
        homs = [np.eye(3)]
        for a in (0, 1):
            b = a + 1
            idx, acc, _, _ = sharded_match(
                kps[b].desc, kps[b].valid, kps[a].desc, kps[a].valid, mesh
            )
            idx, acc = np.asarray(idx), np.asarray(acc)
            vb = np.asarray(kps[b].valid)
            rows = np.nonzero(acc & vb)[0]
            p1 = np.stack([np.asarray(kps[b].x)[rows],
                           np.asarray(kps[b].y)[rows]], 1)
            p2 = np.stack([np.asarray(kps[a].x)[idx[rows]],
                           np.asarray(kps[a].y)[idx[rows]], ], 1)
            cap = 1 << int(np.ceil(np.log2(max(len(p1), 8))))
            q1 = np.zeros((cap, 2), np.float32)
            q2 = np.zeros((cap, 2), np.float32)
            v = np.zeros(cap, bool)
            q1[:len(p1)], q2[:len(p2)], v[:len(p1)] = p1, p2, True
            h, _, _ = ransac_homography(
                jnp.asarray(q1), jnp.asarray(q2), jnp.asarray(v), 512, 3.0, 7
            )
            homs.append(homs[-1] @ np.asarray(h, np.float64))
        return composite([np.asarray(c, np.float32) for c in crops], homs,
                         seam_aware=False)

    # --- uninterrupted job on the full 8-device mesh ---
    mesh8 = make_mesh(data=1, kp=8)
    kps_full = [detect_ckpt(i) for i in range(3)]
    pano_full = finish(kps_full, mesh8)

    # --- interrupted job: frames 0-1 checkpointed, then devices 4..7 die ---
    for p in tmp_path.glob("kp_02*.npz"):
        p.unlink()  # frame 2 never completed
    survivors = jax.devices()[:4]
    mesh4 = make_mesh(data=1, kp=4, devices=survivors)
    kps_resume = []
    for i in range(3):
        ck = tmp_path / f"kp_{i:02d}.npz"
        if ck.exists():
            kps_resume.append(load_keypoints(str(ck)))
        else:
            kps_resume.append(detect_ckpt(i))  # re-detect only the missing one
    pano_resume = finish(kps_resume, mesh4)

    assert pano_full.shape == pano_resume.shape
    np.testing.assert_array_equal(pano_full, pano_resume)
