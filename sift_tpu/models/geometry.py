"""Multi-view geometry primitives (pure JAX, batched, MXU-friendly).

The reference stops at 2D homography stitching; the SfM extension
(BASELINE.json north star) needs calibrated two-view geometry.  Everything
here is fixed-shape and batched: RANSAC runs as a fixed block of hypotheses
(like models/stitch.ransac_homography), never as a data-dependent loop.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """so(3) -> SO(3) exponential map. rvec (..., 3) -> (..., 3, 3).

    Uses the unnormalized skew form R = I + A[w]x + B[w]x^2 with Taylor
    series for small angles so jacfwd/jacrev stay finite at rvec = 0 (BA
    linearizes around identity rotations all the time).
    """
    theta2 = jnp.sum(rvec * rvec, axis=-1, keepdims=True)
    small = theta2 < 1e-12
    theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(theta2_safe)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    wx, wy, wz = rvec[..., 0], rvec[..., 1], rvec[..., 2]
    zero = jnp.zeros_like(wx)
    K = jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.eye(3, dtype=rvec.dtype)
    return eye + a[..., None] * K + b[..., None] * (K @ K)


def project_points(rvec, tvec, pts3d, fxy, cxy):
    """Pinhole projection: (..., 3) world points -> (..., 2) pixels."""
    r = rodrigues(rvec)
    pc = pts3d @ jnp.swapaxes(r, -1, -2) + tvec[..., None, :]
    z = jnp.maximum(pc[..., 2:3], 1e-9)
    xy = pc[..., :2] / z
    return xy * fxy + cxy, pc[..., 2]


def triangulate(p1, p2, r1, t1, r2, t2):
    """Linear (DLT) triangulation of normalized image points.

    p1, p2: (N, 2) normalized coordinates in cameras (r1, t1), (r2, t2) with
    projection x = R X + t.  Returns (N, 3) world points.
    """
    def rows(p, r, t):
        pr = jnp.concatenate([r, t[:, None]], axis=1)  # (3, 4)
        a1 = p[:, 0:1] * pr[2][None] - pr[0][None]
        a2 = p[:, 1:2] * pr[2][None] - pr[1][None]
        return a1, a2

    a1, a2 = rows(p1, r1, t1)
    a3, a4 = rows(p2, r2, t2)
    a = jnp.stack([a1, a2, a3, a4], axis=1)  # (N, 4, 4)
    x = _min_eigvec(a)
    return x[:, :3] / jnp.where(jnp.abs(x[:, 3:]) < 1e-12, 1e-12, x[:, 3:])


def _min_eigvec(a: jnp.ndarray) -> jnp.ndarray:
    """Least-squares null vector of (..., M, D) via D x D normal equations +
    eigh — same minimizer as the SVD null vector but a tiny fixed-size
    eigensolve that compiles/runs far faster on TPU than batched SVD."""
    ata = jnp.einsum("...mi,...mj->...ij", a, a)
    _, vecs = jnp.linalg.eigh(ata)
    return vecs[..., :, 0]


def _essential_from_8pt(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Batched 8-point essential matrix: (..., 8, 2) pairs -> (..., 3, 3).

    Inputs are normalized (calibrated) coordinates; the rank/eigenvalue
    constraint diag(1, 1, 0) is enforced by SVD projection.
    """
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    o = jnp.ones_like(x1)
    a = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o], axis=-1
    )  # (..., 8, 9)
    e = _min_eigvec(a).reshape(*a.shape[:-2], 3, 3)
    u, s, vt2 = jnp.linalg.svd(e)
    s_fixed = jnp.stack(
        [jnp.ones_like(s[..., 0]), jnp.ones_like(s[..., 0]), jnp.zeros_like(s[..., 0])],
        axis=-1,
    )
    return u @ (s_fixed[..., None] * vt2)


def _sampson_err2(e: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Squared Sampson distance: e (..., 3, 3), p (N, 2) -> (..., N)."""
    ones = jnp.ones_like(p1[..., :1])
    x1 = jnp.concatenate([p1, ones], axis=-1)
    x2 = jnp.concatenate([p2, ones], axis=-1)
    ex1 = jnp.einsum("...ij,nj->...ni", e, x1)
    etx2 = jnp.einsum("...ji,nj->...ni", e, x2)
    x2ex1 = jnp.einsum("ni,...ni->...n", x2, ex1)
    denom = (
        ex1[..., 0] ** 2 + ex1[..., 1] ** 2 + etx2[..., 0] ** 2 + etx2[..., 1] ** 2
    )
    return x2ex1**2 / jnp.maximum(denom, 1e-12)


@partial(jax.jit, static_argnums=(3,))
def ransac_essential(
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    valid: jnp.ndarray,
    num_hypotheses: int = 1024,
    inlier_threshold: float = 1e-3,
    seed: int = 0,
):
    """Essential matrix from normalized correspondences, batched RANSAC.

    Returns (E (3,3), inlier_mask, num_inliers).
    """
    n = p1.shape[0]
    key = jax.random.PRNGKey(seed)
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    idx = jax.random.choice(key, n, shape=(num_hypotheses, 8), replace=True, p=probs)
    e = _essential_from_8pt(p1[idx], p2[idx])
    err2 = _sampson_err2(e, p1, p2)
    inl = (err2 < inlier_threshold**2) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    e_best = e[best]
    mask = inl[best]

    # Refit on all inliers (weighted 8-point over the full set).
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    o = jnp.ones_like(x1)
    a = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o], axis=-1)
    a = a * mask.astype(a.dtype)[:, None]
    e_ref = _min_eigvec(a).reshape(3, 3)
    u, s, vt2 = jnp.linalg.svd(e_ref)
    e_ref = u @ (jnp.array([1.0, 1.0, 0.0], e_ref.dtype)[:, None] * vt2)
    err2_r = _sampson_err2(e_ref[None], p1, p2)[0]
    inl_r = (err2_r < inlier_threshold**2) & valid
    use_refit = jnp.sum(inl_r) >= counts[best]
    e_out = jnp.where(use_refit, e_ref, e_best)
    mask_out = jnp.where(use_refit, inl_r, mask)
    return e_out, mask_out, jnp.sum(mask_out)


def recover_pose(e: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray, valid: jnp.ndarray):
    """Decompose E into the (R, t) with maximal cheirality support.

    Convention: x2 = R x1 + t (camera 1 at identity).  Returns (R, t, front
    mask) with |t| = 1.
    """
    u, _, vt = jnp.linalg.svd(e)
    # Ensure proper rotations.
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))[..., None]
    w = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], e.dtype)
    r_a = u @ w @ vt
    r_b = u @ w.T @ vt
    t_u = u[:, 2]

    eye = jnp.eye(3, dtype=e.dtype)
    zero = jnp.zeros(3, dtype=e.dtype)

    def support(r, t):
        x = triangulate(p1, p2, eye, zero, r, t)
        z1 = x[:, 2]
        x2c = x @ r.T + t
        z2 = x2c[:, 2]
        front = (z1 > 0) & (z2 > 0) & valid
        return jnp.sum(front), front

    cands = [(r_a, t_u), (r_a, -t_u), (r_b, t_u), (r_b, -t_u)]
    counts = []
    fronts = []
    for r, t in cands:
        c, f = support(r, t)
        counts.append(c)
        fronts.append(f)
    counts = jnp.stack(counts)
    best = jnp.argmax(counts)
    rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return rs[best], ts[best], jnp.stack(fronts)[best]


@partial(jax.jit, static_argnums=(3,))
def ransac_pnp(
    pts3d: jnp.ndarray,
    pts2d: jnp.ndarray,
    valid: jnp.ndarray,
    num_hypotheses: int = 1024,
    inlier_threshold: float = 8e-3,
    seed: int = 0,
):
    """Camera pose from 3D-2D correspondences (normalized 2D), DLT + RANSAC.

    Returns (rvec, tvec, inlier_mask, count) with x_cam = R X + t.
    Minimal sample: 6 points (linear DLT of the 3x4 projection matrix).
    """
    n = pts3d.shape[0]
    key = jax.random.PRNGKey(seed)
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    idx = jax.random.choice(key, n, shape=(num_hypotheses, 6), replace=True, p=probs)

    X = pts3d[idx]  # (K, 6, 3)
    x = pts2d[idx]  # (K, 6, 2)
    o = jnp.ones_like(X[..., :1])
    z = jnp.zeros_like(jnp.concatenate([X, o], axis=-1))
    Xh = jnp.concatenate([X, o], axis=-1)  # (K, 6, 4)
    r1 = jnp.concatenate([Xh, z, -x[..., 0:1] * Xh], axis=-1)
    r2 = jnp.concatenate([z, Xh, -x[..., 1:2] * Xh], axis=-1)
    a = jnp.concatenate([r1, r2], axis=-2)  # (K, 12, 12)
    p = _min_eigvec(a).reshape(-1, 3, 4)

    # Decompose P = [M | p4] -> R, t with orthogonalization of M.
    m = p[:, :, :3]
    det = jnp.linalg.det(m)
    p = p * jnp.sign(det)[:, None, None]
    m = p[:, :, :3]
    u, s, vtm = jnp.linalg.svd(m)
    r = u @ vtm
    scale = jnp.mean(s, axis=-1)
    t = p[:, :, 3] / jnp.maximum(scale, 1e-12)[:, None]

    pc = jnp.einsum("kij,nj->kni", r, pts3d) + t[:, None, :]
    zc = pc[..., 2]
    proj = pc[..., :2] / jnp.where(jnp.abs(pc[..., 2:]) < 1e-9, 1e-9, pc[..., 2:])
    err2 = jnp.sum((proj - pts2d[None]) ** 2, axis=-1)
    inl = (err2 < inlier_threshold**2) & (zc > 0) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)

    r_best = r[best]
    t_best = t[best]
    # rvec via log map.
    cos = jnp.clip((jnp.trace(r_best) - 1) / 2, -1.0, 1.0)
    theta = jnp.arccos(cos)
    axis = jnp.stack(
        [
            r_best[2, 1] - r_best[1, 2],
            r_best[0, 2] - r_best[2, 0],
            r_best[1, 0] - r_best[0, 1],
        ]
    )
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-12)
    rvec = axis * theta
    return rvec, t_best, inl[best], counts[best]
