"""Cylindrical panorama components: focal estimation from rotation
homographies, cylindrical warp properties, robust translation."""

from __future__ import annotations

import math

import numpy as np
import pytest

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
    # supersample=1: the identity contract is about the geometry; the
    # default 2x2 area prefilter intentionally box-blurs by half a pixel.
    out, mask = cylindrical_warp(jnp.asarray(img), 5000.0, 0, 1)
    out = np.asarray(out)
    mask = np.asarray(mask)
    # Huge focal => near-identity mapping in the interior.
    assert mask[32, 48] == 1.0
    np.testing.assert_allclose(out[20:44, 30:66], img[20:44, 30:66], atol=2.0)


def test_cylindrical_warp_supersample_kills_moire():
    """A fine-period vertical grating minified by the cylinder map must not
    alias into low-frequency streaks (round-3 CAVE-04 blocking defect).

    Metric: energy of the warped image's low-frequency vertical bands in a
    side region (where cos(theta) minifies).  The 2x2 area prefilter must
    cut it well below the plain bilinear warp's.
    """
    h, w = 128, 512
    f = 220.0  # strong edge minification: cos at the border ~ 0.66
    ys = np.arange(h)
    grating = (np.tile(((ys // 2) % 2)[:, None], (1, w)) * 255.0)
    img = jnp.asarray(np.repeat(grating[:, :, None], 3, axis=2).astype(np.float32))

    def lowfreq_energy(out):
        side = np.asarray(out)[20:-20, -120:-40, 0]
        spec = np.abs(np.fft.rfft(side - side.mean(0), axis=0))
        # the grating itself lives at the top of the spectrum; aliased
        # streaks land in the low bins
        return float(spec[1:10].sum())

    plain, _ = cylindrical_warp(img, f, 0, 1)
    aa, _ = cylindrical_warp(img, f, 0, 2)
    e_plain = lowfreq_energy(plain)
    e_aa = lowfreq_energy(aa)
    assert e_aa < 0.55 * e_plain, (e_plain, e_aa)


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


def test_robust_rigid_and_global_solve():
    """Per-edge Procrustes recovers (roll, translation) under outliers, and
    the global solve chains angles/offsets consistently."""
    from sift_tpu.models.cylindrical import (
        _rot2,
        robust_rigid,
        solve_global_rigid,
    )

    rng = np.random.default_rng(5)
    n = 200
    p1 = rng.uniform(0, 300, (n, 2))
    alpha_true, t_true = 0.02, np.array([45.0, -7.0])
    p2 = p1 @ _rot2(alpha_true).T + t_true + rng.normal(0, 0.25, (n, 2))
    p2[:30] = rng.uniform(0, 300, (30, 2))  # outliers
    al, t, inl = robust_rigid(p1, p2, np.ones(n, bool))
    assert inl > 120
    assert abs(al - alpha_true) < 2e-3, al
    np.testing.assert_allclose(t, t_true, atol=0.6)

    # three images: 1 is center; edges (0,1), (1,2) with known rigids
    phis_true = np.array([0.015, 0.0, -0.02])
    offs_true = np.array([[100.0, 5.0], [0.0, 0.0], [-95.0, 3.0]])

    def edge_rigid(i, j):
        # p_j = R(phi_j)^-1 (R(phi_i) p_i + o_i - o_j)
        a = phis_true[i] - phis_true[j]
        t = _rot2(-phis_true[j]) @ (offs_true[i] - offs_true[j])
        return a, t

    edges = [(0, 1), (1, 2)]
    alphas, ts = zip(*(edge_rigid(i, j) for i, j in edges))
    phis, offs = solve_global_rigid(3, 1, edges, list(alphas), list(ts))
    np.testing.assert_allclose(phis, phis_true, atol=1e-9)
    np.testing.assert_allclose(offs, offs_true, atol=1e-6)


@pytest.mark.slow
def test_cave04_subset_quality_gate():
    """REAL-scene quality gate (round-3 verdict: the synthetic-crop gate
    missed visible defects on the actual CAVE-04 render).  Stitches a
    6-frame half-res subset of the real Times Square sweep and asserts the
    pre-blend overlap consistency of the registered layout."""
    import pathlib

    import jax.numpy as jnp

    from sift_tpu import SiftConfig
    from sift_tpu.models.blend import overlap_consistency
    from sift_tpu.models.cylindrical import stitch_scene_cylindrical
    from sift_tpu.models.stitch import _canvas_layout
    from sift_tpu.utils.io import load_image
    from sift_tpu.utils.stitch_graph import StitchGraph

    scene = pathlib.Path(
        "/root/reference/stitching/collection/Dataset/CAVE-04_times_square"
    )
    if not scene.exists():
        pytest.skip("reference dataset not mounted")
    idxs = [3, 4, 5, 6, 7, 8]  # consecutive frames: every chain edge is a
    # true heavy-overlap edge (the scene's own graph pairs 4 with 5 and 10)
    images = [load_image(str(scene / f"{i:02d}.jpg"))[::2, ::2] for i in idxs]
    graph = StitchGraph(
        center_index=1, center_rotation=0.0, images_count=len(images),
        edges=tuple((a, a + 1) for a in range(len(images) - 1)),
    )
    cfg = SiftConfig(dtype=jnp.float32, extrema_cap=2048, kp_cap=1024,
                     ori_cap=2048)
    diag: dict = {}
    pano = stitch_scene_cylindrical(images, graph, cfg, diagnostics=diag)
    assert pano.shape[1] > images[0].shape[1]  # actually panoramic
    assert len(diag["warped"]) == len(images), "images dropped from layout"
    # Geometric gate: median canvas residual of matched features under the
    # solved global warps — immune to the scene's animated billboards and
    # crowds.  Defect-free render measures ~1-1.5 px at half-res; the
    # round-3 misaligned layout (uncorrected ~2 degree per-frame roll) put
    # tens of px of drift at the frame corners.
    assert diag["edge_residual_px"] < 3.0, diag["edge_residuals"]
    # Photometric sanity (loose: billboards change content between frames).
    oh, ow, t = _canvas_layout(diag["warped"], diag["homographies"])
    ci = overlap_consistency(
        diag["warped"], [t @ h for h in diag["homographies"]], oh, ow
    )
    assert ci < 60.0, f"overlap consistency degraded: {ci}"
