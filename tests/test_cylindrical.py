"""Cylindrical panorama components: focal estimation from rotation
homographies, cylindrical warp properties, robust translation."""

from __future__ import annotations

import math

import numpy as np

import jax.numpy as jnp

from sift_tpu.models.cylindrical import (
    cylindrical_warp,
    estimate_focal,
    robust_translation,
)


def _rotation_homography(f, cx, cy, angle):
    k = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1.0]])
    c, s = math.cos(angle), math.sin(angle)
    r = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    h = k @ r @ np.linalg.inv(k)
    return h / h[2, 2]


def test_estimate_focal_from_rotation():
    f_true = 520.0
    hs = [
        _rotation_homography(f_true, 320, 240, a)
        for a in (0.15, -0.2, 0.3)
    ]
    f = estimate_focal(hs, 640)
    assert abs(f - f_true) / f_true < 0.05, f


def test_estimate_focal_fallback():
    assert estimate_focal([np.eye(3)], 640) == 0.85 * 640


def test_cylindrical_warp_center_preserved():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (64, 96, 3)).astype(np.float32)
    out, mask = cylindrical_warp(jnp.asarray(img), 5000.0)
    out = np.asarray(out)
    mask = np.asarray(mask)
    # Huge focal => near-identity mapping in the interior.
    assert mask[32, 48] == 1.0
    np.testing.assert_allclose(out[20:44, 30:66], img[20:44, 30:66], atol=2.0)


def test_cylindrical_rotation_becomes_translation():
    """A y-axis camera rotation shifts the cylindrical image horizontally."""
    f = 200.0
    h, w = 80, 120
    # Scene: a textured plane rendered via pinhole at two yaw angles.
    rng = np.random.default_rng(1)
    tex = rng.uniform(0, 255, (400, 600)).astype(np.float32)

    def render(yaw):
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        cx, cy = (w - 1) / 2, (h - 1) / 2
        # Ray for each pixel, rotated by yaw, intersect plane z=5.
        dx = (xs - cx) / f
        dy = (ys - cy) / f
        c, s = math.cos(yaw), math.sin(yaw)
        rx = c * dx + s
        rz = -s * dx + c
        px = 5 * rx / rz
        py = 5 * dy / rz
        u = np.clip((px + 3) * 90, 0, 599).astype(int)
        v = np.clip((py + 2) * 90, 0, 399).astype(int)
        return tex[v, u]

    img1 = render(0.0)[:, :, None].repeat(3, axis=2)
    img2 = render(0.08)[:, :, None].repeat(3, axis=2)
    w1, m1 = cylindrical_warp(jnp.asarray(img1), f)
    w2, m2 = cylindrical_warp(jnp.asarray(img2), f)
    w1 = np.asarray(w1)[:, :, 0]
    w2 = np.asarray(w2)[:, :, 0]
    # Expected shift = -f * yaw ~ -16 px (content moves against the
    # rotation).  Compare shifted central crops.
    shift = -int(round(f * 0.08))
    a = w1[30:50, 40:80]
    b = w2[30:50, 40 + shift : 80 + shift]
    # normalized correlation
    a0 = a - a.mean()
    b0 = b - b.mean()
    corr = (a0 * b0).sum() / np.sqrt((a0**2).sum() * (b0**2).sum())
    assert corr > 0.75, corr


def test_robust_translation():
    rng = np.random.default_rng(2)
    n = 200
    p1 = rng.uniform(0, 100, (n, 2))
    p2 = p1 + [7.0, -3.0] + rng.normal(0, 0.3, (n, 2))
    p2[:40] = rng.uniform(0, 100, (40, 2))  # outliers
    ok = np.ones(n, bool)
    t, inl = robust_translation(p1, p2, ok)
    assert inl > 100
    np.testing.assert_allclose(t, [7.0, -3.0], atol=0.2)


def test_stitch_scene_cylindrical_end_to_end():
    """Full cylindrical driver on three overlapping crops of a real photo
    (translations exercise the estimation path; focal falls back cleanly)."""
    import jax.numpy as jnp

    from sift_tpu import SiftConfig
    from sift_tpu.models.cylindrical import stitch_scene_cylindrical
    from sift_tpu.utils.io import load_image
    from sift_tpu.utils.stitch_graph import StitchGraph

    tex = load_image(
        "/root/reference/stitching/collection/Dataset/CAVE-01_atrium/05.jpg"
    )
    crops = [tex[:, 0:360], tex[:, 140:500], tex[:, 280:640]]
    graph = StitchGraph(center_index=1, center_rotation=0.0, images_count=3,
                        edges=((0, 1), (1, 2)))
    cfg = SiftConfig(dtype=jnp.float32, extrema_cap=1024, kp_cap=512,
                     ori_cap=2048)
    diag: dict = {}
    pano = stitch_scene_cylindrical(crops, graph, cfg, focal=2000.0,
                                    diagnostics=diag)
    # Large focal => near-planar: the mosaic should span ~the full scene.
    assert pano.shape[0] >= 400 and pano.shape[1] >= 560, pano.shape
    assert pano.std() > 10
    # Quality gate: registered overlaps must agree (mean |dI| in overlap);
    # crops of one photo are exactly alignable, so the bound is tight.
    from sift_tpu.models.blend import overlap_consistency
    from sift_tpu.models.stitch import _canvas_layout

    oh, ow, t = _canvas_layout(diag["warped"], diag["homographies"])
    ci = overlap_consistency(
        diag["warped"], [t @ h for h in diag["homographies"]], oh, ow
    )
    assert ci < 6.0, f"overlap consistency degraded: {ci}"
