"""End-to-end SfM from rendered images with real parallax.

Renders a translating-camera sequence over a multi-depth planar scene
textured with a real photograph (fronto-parallel planes at different depths
shift with true disparity, far planes drawn first for occlusion), then runs
the full run_sfm path — SIFT detection, ratio matching, tracks, two-view
init, PnP registration, Schur-complement BA — and checks the recovered
camera track against ground truth."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from sift_tpu import SiftConfig
from sift_tpu.models.geometry import rodrigues
from sift_tpu.models.sfm import run_sfm
from sift_tpu.utils.io import load_image

TEXTURE = "/root/reference/stitching/collection/Dataset/CAVE-01_atrium/00.jpg"


def render_sequence(n_frames=6, w=320, h=240, fx=300.0, baseline=0.08,
                    ts=None):
    """Planar-stack renderer: three texture bands at depths 4/6/9 units.

    Camera translates along +x by ``baseline`` per frame (or follows the
    explicit per-frame ``ts`` trajectory, enabling loops/revisits); a plane
    at depth d shifts by fx * t / d pixels.  Returns (frames, gt_centers).
    """
    tex = load_image(TEXTURE)[:, :, :3]
    tex = tex[: h + 60, : w + 120]
    depths = [9.0, 6.0, 4.0]
    # horizontal bands (far at top), each a slice of the texture
    bands = [tex[i * 80 : i * 80 + 100] for i in range(3)]
    frames = []
    centers = []
    if ts is None:
        ts = [f * baseline for f in range(n_frames)]
    for t in ts:
        img = np.zeros((h, w, 3), np.float32)
        for band, d in zip(bands, depths):
            shift = fx * t / d
            # Subpixel sampling: integer rounding here would corrupt the
            # ground truth itself (up to 0.5 px/frame of fake motion).
            x0 = int(np.floor(shift))
            frac = np.float32(shift - x0)
            lo = band[:, x0 : x0 + w]
            hi = band[:, x0 + 1 : x0 + 1 + w]
            src = (1 - frac) * lo[:, : hi.shape[1]] + frac * hi
            y0 = {9.0: 0, 6.0: 80, 4.0: 160}[d]
            img[y0 : y0 + src.shape[0], : src.shape[1]] = src[: h - y0]
        frames.append(img)
        centers.append(np.array([t, 0.0, 0.0]))
    return frames, np.stack(centers)


@pytest.mark.slow
def test_run_sfm_on_rendered_sequence():
    frames, gt_centers = render_sequence()
    k = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]])
    cfg = SiftConfig(
        dtype=jnp.float32, extrema_cap=2048, kp_cap=1024, ori_cap=2048
    )
    res = run_sfm(frames, k, cfg, ba_iters=15)
    assert res.info["n_points"] > 30, res.info

    centers = np.stack(
        [
            -(np.asarray(rodrigues(jnp.asarray(res.poses[i, :3]))).T
              @ res.poses[i, 3:])
            for i in range(len(frames))
        ]
    )
    # Scale-align (monocular gauge) on the translation magnitudes, then the
    # track must be a straight +x translation matching ground truth.
    norm_est = np.linalg.norm(centers[-1])
    norm_gt = np.linalg.norm(gt_centers[-1])
    assert norm_est > 1e-6
    scaled = centers * (norm_gt / norm_est)
    ate = np.sqrt(((scaled - gt_centers) ** 2).sum(axis=1).mean())
    span = np.linalg.norm(gt_centers[-1] - gt_centers[0])
    assert ate < 0.15 * span, (ate, span, scaled[:, 0])
