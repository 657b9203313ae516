"""Cylindrical panoramas for wide-FOV sweeps.

Planar (homography) mosaics blow up as the total field of view approaches
180 degrees — visible as extreme stretching at the panorama edges (e.g. the
CAVE-04 Times Square sweep).  The classic fix (Brown & Lowe's AutoStitch
recipe): estimate the focal length from the pairwise homographies, prewarp
every image into cylindrical coordinates (where a rotation about the vertical
axis becomes a pure horizontal translation), estimate per-edge translations
robustly, chain them, and feather-blend on a flat canvas.

All warps are device programs (inverse-map bilinear gathers); translation
estimation reuses the SIFT matcher on the warped images.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def focal_from_homography(h: np.ndarray) -> list[float]:
    """Focal-length candidates from one inter-image homography
    (Brown & Lowe 2003; same estimator OpenCV uses)."""
    h = np.asarray(h, np.float64).reshape(-1)
    out = []
    # f1 (target image)
    d1 = h[6] * h[7]
    d2 = (h[7] - h[6]) * (h[7] + h[6])
    v1 = -(h[0] * h[1] + h[3] * h[4]) / d1 if abs(d1) > 1e-12 else -1
    v2 = (h[0] ** 2 + h[3] ** 2 - h[1] ** 2 - h[4] ** 2) / d2 if abs(d2) > 1e-12 else -1
    if v1 > 0 and v2 > 0:
        out.append(math.sqrt(max(v1, v2) if abs(d1) > abs(d2) else min(v1, v2)))
    elif v1 > 0:
        out.append(math.sqrt(v1))
    elif v2 > 0:
        out.append(math.sqrt(v2))
    # f0 (source image)
    d1 = h[0] * h[3] + h[1] * h[4]
    d2 = h[0] ** 2 + h[1] ** 2 - h[3] ** 2 - h[4] ** 2
    v1 = -h[2] * h[5] / d1 if abs(d1) > 1e-12 else -1
    v2 = (h[5] ** 2 - h[2] ** 2) / d2 if abs(d2) > 1e-12 else -1
    if v1 > 0 and v2 > 0:
        out.append(math.sqrt(max(v1, v2) if abs(d1) > abs(d2) else min(v1, v2)))
    elif v1 > 0:
        out.append(math.sqrt(v1))
    elif v2 > 0:
        out.append(math.sqrt(v2))
    return out


def estimate_focal(
    homographies: list[np.ndarray], width: int, height: int | None = None
) -> float:
    """Median focal over all edges; fallback 0.85 * width.

    The Brown & Lowe estimator assumes the principal point at the origin, so
    pixel-space homographies are conjugated by the image-center translation
    first (same convention as OpenCV's stitching matcher).
    """
    height = height if height is not None else int(width * 3 / 4)
    cx, cy = (width - 1) / 2.0, (height - 1) / 2.0
    c_fwd = np.array([[1, 0, cx], [0, 1, cy], [0, 0, 1.0]])
    c_inv = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1.0]])
    cands: list[float] = []
    for h in homographies:
        hn = c_inv @ np.asarray(h, np.float64) @ c_fwd
        if abs(hn[2, 2]) < 1e-12:
            continue
        hn = hn / hn[2, 2]
        cands.extend(focal_from_homography(hn))
    good = [f for f in cands if 0.2 * width < f < 10 * width]
    if good:
        return float(np.median(good))
    return 0.85 * width


@partial(jax.jit, static_argnums=(1, 2))
def cylindrical_warp(img: jnp.ndarray, f: float, border: int = 0):
    """Project an (H, W, C) image onto a cylinder of focal f.

    Output pixel (xc, yc): theta = (xc - cx) / f, hgt = (yc - cy) / f;
    source x = cx + f * tan(theta), y = cy + f * hgt / cos(theta).
    Returns (warped (H, W + 2*border, C), mask (H, W + 2*border)).
    """
    h, w = img.shape[0], img.shape[1]
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    out_w = w + 2 * border
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(out_w, dtype=jnp.float32),
        indexing="ij",
    )
    theta = (xs - border - cx) / f
    hgt = (ys - cy) / f
    sx = cx + f * jnp.tan(theta)
    sy = cy + f * hgt / jnp.cos(theta)

    inside = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1) & (
        jnp.abs(theta) < 1.2
    )
    x0 = jnp.clip(jnp.floor(sx), 0, w - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(sy), 0, h - 1).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    v = (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x1] * fx * (1 - fy)
        + img[y1, x0] * (1 - fx) * fy
        + img[y1, x1] * fx * fy
    )
    mask = inside.astype(jnp.float32)
    return v * mask[..., None], mask


def robust_translation(p1: np.ndarray, p2: np.ndarray, ok: np.ndarray,
                       tol: float = 3.0) -> tuple[np.ndarray, int]:
    """Translation p1 -> p2 by median + inlier-mean (host-side, tiny)."""
    d = (p2 - p1)[ok]
    if len(d) == 0:
        return np.zeros(2), 0
    med = np.median(d, axis=0)
    inl = np.linalg.norm(d - med, axis=1) < tol
    if inl.sum() == 0:
        return med, 0
    return d[inl].mean(axis=0), int(inl.sum())


def stitch_scene_cylindrical(
    images: list[np.ndarray],
    graph,
    cfg=None,
    focal: float | None = None,
) -> np.ndarray:
    """Wide-FOV panorama: cylindrical prewarp + translation chaining.

    Focal comes from the pairwise planar homographies unless given.  After
    prewarping, each STITCH-GRAPH tree edge contributes a robust translation;
    translations chain toward the center image and the warped images blend on
    a flat canvas (reusing blend_warped with translation homographies).
    """
    from sift_tpu import SiftConfig, detect_and_describe
    from sift_tpu.models.stitch import (
        blend_warped,
        match_points,
        ransac_homography,
    )

    cfg = cfg or SiftConfig()
    parents = graph.bfs_parents()
    edge_list = [
        (i, p) for i, p in parents.items() if i != graph.center_index
    ]

    # Pass 1: planar pipeline for focal estimation.
    kps = [detect_and_describe(img, cfg) for img in images]
    hs = []
    for i, parent in edge_list:
        p1, p2, ok = match_points(kps[i], kps[parent], cfg.ratio_threshold)
        h, _, _ = ransac_homography(p1, p2, ok, 1024)
        hs.append(h)
    hs_host = np.asarray(jnp.stack(hs), np.float64) if hs else np.zeros((0, 3, 3))
    f = focal if focal is not None else estimate_focal(
        list(hs_host), images[0].shape[1], images[0].shape[0]
    )

    # Pass 2: cylindrical prewarp + translation estimation on warped images.
    warped = []
    for img in images:
        wimg, _ = cylindrical_warp(jnp.asarray(img, jnp.float32), float(f))
        warped.append(wimg)
    kps_w = [detect_and_describe(np.asarray(w), cfg) for w in warped]

    trans: dict[tuple[int, int], np.ndarray] = {}
    results = []
    for i, parent in edge_list:
        p1, p2, ok = match_points(kps_w[i], kps_w[parent], cfg.ratio_threshold)
        results.append((i, parent, p1, p2, ok))
    # One host sync for all match buffers.
    results = [
        (i, p, np.asarray(a), np.asarray(b), np.asarray(o))
        for (i, p, a, b, o) in results
    ]
    for i, parent, p1, p2, ok in results:
        t, n_inl = robust_translation(p1, p2, ok)
        trans[(i, parent)] = t

    offsets: dict[int, np.ndarray] = {graph.center_index: np.zeros(2)}

    def resolve(i: int) -> np.ndarray:
        if i in offsets:
            return offsets[i]
        parent = parents[i]
        offsets[i] = resolve(parent) + trans[(i, parent)]
        return offsets[i]

    for i in parents:
        resolve(i)

    order = sorted(offsets)
    homs = []
    for i in order:
        t = np.eye(3)
        t[0, 2], t[1, 2] = offsets[i]
        homs.append(t)
    return blend_warped(
        [np.asarray(warped[i], np.float32) for i in order], homs
    )
