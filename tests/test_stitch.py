"""Stitching unit tests: RANSAC homography recovery, warp/blend identity,
stitch-graph parsing."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from sift_tpu.models.stitch import (
    _apply_h,
    blend_warped,
    ransac_homography,
    warp_accumulate,
)
from sift_tpu.utils.stitch_graph import parse_stitch_graph

GRAPH = (
    "/root/reference/stitching/collection/Dataset/"
    "NISwGSP-06_PalazzoPubblico/NISwGSP-06_PalazzoPubblico-STITCH-GRAPH.txt"
)


def test_parse_stitch_graph():
    g = parse_stitch_graph(GRAPH)
    assert g.center_index == 1
    assert g.center_rotation == 0.0
    assert g.images_count == 5
    assert (0, 1) in g.edges and (0, 4) in g.edges and (3, 4) in g.edges
    parents = g.bfs_parents()
    assert parents[1] == 1
    assert set(parents) == {0, 1, 2, 3, 4}
    # every non-center node chains toward the center
    for i, p in parents.items():
        if i != 1:
            assert (min(i, p), max(i, p)) in g.edges


def test_stitch_graph_subset():
    """Dataset mounts can ship fewer images than the graph declares."""
    g = parse_stitch_graph(GRAPH)  # declares 5 images, center 1
    s = g.subset(3)
    assert s.images_count == 3
    assert all(a < 3 and b < 3 for a, b in s.edges)
    assert s.center_index == 1
    # Center outside the subset: re-centered to the best-connected node.
    s2 = g.subset(1)
    assert s2.center_index == 0 and s2.edges == ()


def _random_h(rng):
    h = np.eye(3)
    h[0, 0] = 1.1
    h[1, 1] = 0.93
    h[0, 1] = 0.08
    h[1, 0] = -0.05
    h[0, 2] = 25.0
    h[1, 2] = -13.0
    h[2, 0] = 1e-4
    h[2, 1] = -8e-5
    return h


def test_ransac_recovers_homography():
    rng = np.random.default_rng(0)
    n = 512
    h_true = _random_h(rng)
    p1 = rng.uniform(0, 500, (n, 2))
    ph = np.concatenate([p1, np.ones((n, 1))], axis=1) @ h_true.T
    p2 = ph[:, :2] / ph[:, 2:3]
    # 35% outliers + invalid lanes
    n_out = 180
    p2[:n_out] = rng.uniform(0, 500, (n_out, 2))
    valid = np.ones(n, bool)
    valid[-40:] = False

    h, inliers, count = ransac_homography(
        jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32),
        jnp.asarray(valid), 1024,
    )
    h = np.asarray(h, np.float64)
    assert int(count) >= n - n_out - 40 - 5
    # project a grid and compare against the true homography
    g = rng.uniform(50, 450, (100, 2))
    gh = np.concatenate([g, np.ones((100, 1))], axis=1)
    want = gh @ h_true.T
    want = want[:, :2] / want[:, 2:3]
    got = gh @ h.T
    got = got[:, :2] / got[:, 2:3]
    assert np.abs(got - want).max() < 0.5


def test_warp_identity():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (40, 60, 3)).astype(np.float32)
    acc, w = warp_accumulate(
        jnp.asarray(img), jnp.asarray(np.eye(3), jnp.float32), 40, 60
    )
    out = np.asarray(acc) / np.maximum(np.asarray(w), 1e-8)[:, :, None]
    np.testing.assert_allclose(out, img, atol=1e-3)


def test_blend_identity():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (40, 60, 3)).astype(np.float32)
    out = blend_warped([img], [np.eye(3)])
    assert out.shape == (40, 60, 3)
    np.testing.assert_allclose(out, img, atol=1e-3)


def test_blend_translation_pair():
    """Two overlapping crops of one scene blend back to the scene."""
    rng = np.random.default_rng(3)
    base = rng.uniform(50, 200, (60, 100, 3)).astype(np.float32)
    a = base[:, :70]
    b = base[:, 30:]
    # b's pixel (x, y) = base pixel (x + 30, y): H maps b coords -> a coords.
    h_b_to_a = np.eye(3)
    h_b_to_a[0, 2] = 30.0
    out = blend_warped([a, b], [np.eye(3), h_b_to_a])
    assert out.shape == (60, 100, 3)
    np.testing.assert_allclose(out, base, atol=1.0)


def test_stitch_scene_end_to_end():
    """Full scene driver on three overlapping crops of a real texture."""
    import jax.numpy as jnp

    from sift_tpu import SiftConfig
    from sift_tpu.models.stitch import stitch_scene
    from sift_tpu.utils.io import load_image
    from sift_tpu.utils.stitch_graph import StitchGraph

    tex = load_image(
        "/root/reference/stitching/collection/Dataset/CAVE-01_atrium/05.jpg"
    )
    crops = [tex[:, 0:360], tex[:, 140:500], tex[:, 280:640]]
    graph = StitchGraph(
        center_index=1, center_rotation=0.0, images_count=3,
        edges=((0, 1), (1, 2)),
    )
    cfg = SiftConfig(
        dtype=jnp.float32, extrema_cap=1024, kp_cap=512, ori_cap=2048
    )
    pano = stitch_scene(crops, graph, cfg, num_hypotheses=1024)
    # Canvas should cover roughly the full 640-wide scene at image height.
    assert pano.shape[0] >= 440 and 600 <= pano.shape[1] <= 760, pano.shape
    assert pano.std() > 10  # non-degenerate content
    # Crops are pure translations of one scene: the mosaic must locally match
    # the source.  Compare the central band against the original.
    h, w = pano.shape[:2]
    y0 = (h - 480) // 2 if h > 480 else 0
    x0 = (w - 640) // 2 if w > 640 else 0
    center = pano[y0 + 200 : y0 + 280, x0 + 200 : x0 + 440]
    src = tex[200:280, 200:440]
    err = np.abs(center - src).mean()
    assert err < 20, err
