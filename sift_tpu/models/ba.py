"""Bundle adjustment with Schur-complement reduction over camera blocks.

TPU-first design (BASELINE.json north star): the BA normal equations are
assembled as batched small-block linear algebra —
  U (C,6,6) camera blocks, V (P,3,3) point blocks, W (per-observation 6x3
  cross blocks) — reduced via the Schur complement
  S = U - sum_p W_p V_p^-1 W_p^T
to a dense (6C, 6C) camera system (C is tens of keyframes per window).
Every contraction is a segment_sum / batched matmul; there is no per-point
Python control flow.  The accumulation of S and the rhs is a pure reduction
over points, which is exactly what shards over a device mesh: each device
reduces its point shard and the partial (S, rhs) are psum-ed over ICI
(see parallel/dist.sharded_ba_step).

Observation layout: a flat observation table (cam_idx, pt_idx, uv) plus a
per-point fixed-capacity index table obs_by_point (P, F) into it (-1 pads),
built host-side once per problem.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sift_tpu.models.geometry import project_points


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BAProblem:
    cams: jnp.ndarray       # (C, 6) [rvec, tvec]
    points: jnp.ndarray     # (P, 3)
    obs_cam: jnp.ndarray    # (O,) int32
    obs_pt: jnp.ndarray     # (O,) int32
    obs_uv: jnp.ndarray     # (O, 2) pixels
    obs_mask: jnp.ndarray   # (O,) bool
    obs_by_point: jnp.ndarray  # (P, F) int32 indices into obs, -1 = pad
    fxy: jnp.ndarray        # (2,) focal lengths
    cxy: jnp.ndarray        # (2,) principal point
    fixed_cams: jnp.ndarray  # (C,) bool — gauge freeze


def build_obs_by_point(obs_pt: np.ndarray, num_points: int, cap: int | None = None):
    """Host-side (P, F) observation index table."""
    lists: list[list[int]] = [[] for _ in range(num_points)]
    for o, p in enumerate(obs_pt):
        lists[int(p)].append(o)
    f = cap or max((len(l) for l in lists), default=1)
    table = np.full((num_points, f), -1, np.int32)
    for p, l in enumerate(lists):
        table[p, : min(len(l), f)] = l[:f]
    return table


def _residuals(pr: BAProblem, cams, points):
    uv_hat, z = project_points(
        cams[pr.obs_cam, :3], cams[pr.obs_cam, 3:], points[pr.obs_pt][:, None, :],
        pr.fxy, pr.cxy,
    )
    r = (uv_hat[:, 0, :] - pr.obs_uv) * pr.obs_mask[:, None]
    return r, z[:, 0]


def _cost(pr: BAProblem, cams, points, huber_delta: float | None = None):
    r, _ = _residuals(pr, cams, points)
    if huber_delta is None:
        return jnp.sum(r * r)
    rn = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
    d = huber_delta
    rho = jnp.where(rn <= d, rn * rn, 2.0 * d * rn - d * d)
    return jnp.sum(rho * pr.obs_mask)


def _huber_sqrt_weights(r: jnp.ndarray, delta: float) -> jnp.ndarray:
    """sqrt of the IRLS weight min(1, delta/||r||) per observation.

    Scaling residual and Jacobian rows by this implements a Huber loss in
    the Gauss-Newton normal equations: inliers (||r|| <= delta) keep full
    quadratic weight, outliers contribute linearly.  Without it the L2 BA
    demonstrably walks away from the good incremental solution on loop
    sequences whose merged tracks carry ~20 px outlier observations (the
    round-3 loop-15 "degradation" was exactly this)."""
    rn = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
    return jnp.sqrt(jnp.minimum(1.0, delta / rn))


def _jacobians(pr: BAProblem, cams, points):
    """Per-observation residual + Jacobians wrt its camera (6) and point (3)."""

    def one(cam, x, uv, m):
        def res(cam_and_pt):
            c, p = cam_and_pt
            uv_hat, _ = project_points(c[:3], c[3:], p[None, :], pr.fxy, pr.cxy)
            return (uv_hat[0] - uv) * m

        r = res((cam, x))
        jc, jp = jax.jacfwd(res)((cam, x))
        return r, jc, jp

    return jax.vmap(one)(
        cams[pr.obs_cam], points[pr.obs_pt], pr.obs_uv, pr.obs_mask.astype(cams.dtype)
    )


def _schur_reduce(pr: BAProblem, jc, jp, r, lam):
    """Assemble the damped, Schur-reduced camera system.

    Returns (S (C,6,C,6), rhs (C,6), V_inv (P,3,3), W tables, g_p) — the
    pieces needed for back-substitution.  Pure reductions over observations
    and points (psum-able across point shards).
    """
    c = pr.cams.shape[0]
    p = pr.points.shape[0]
    f = pr.obs_by_point.shape[1]
    dtype = jc.dtype

    jtj_c = jnp.einsum("oki,okj->oij", jc, jc)  # (O, 6, 6)
    jtj_p = jnp.einsum("oki,okj->oij", jp, jp)  # (O, 3, 3)
    g_c_o = jnp.einsum("oki,ok->oi", jc, r)     # (O, 6)
    g_p_o = jnp.einsum("oki,ok->oi", jp, r)     # (O, 3)

    u = jax.ops.segment_sum(jtj_c, pr.obs_cam, c)       # (C, 6, 6)
    v = jax.ops.segment_sum(jtj_p, pr.obs_pt, p)        # (P, 3, 3)
    g_c = -jax.ops.segment_sum(g_c_o, pr.obs_cam, c)    # (C, 6)
    g_p = -jax.ops.segment_sum(g_p_o, pr.obs_pt, p)     # (P, 3)

    # LM damping (additive, scaled by the diagonal).
    eye6 = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    u_l = u + lam * (u * eye6) + 1e-9 * eye6
    v_l = v + lam * (v * eye3) + 1e-9 * eye3
    v_inv = jnp.linalg.inv(v_l)

    # Per-point cross blocks via the obs_by_point table.
    tbl = pr.obs_by_point  # (P, F)
    tmask = (tbl >= 0).astype(dtype)
    tbl_c = jnp.maximum(tbl, 0)
    w = jnp.einsum("pfki,pfkj->pfij", jc[tbl_c], jp[tbl_c])  # (P, F, 6, 3)
    w = w * tmask[:, :, None, None]
    cam_of = pr.obs_cam[tbl_c]  # (P, F)

    y = jnp.einsum("pfij,pjk->pfik", w, v_inv)  # (P, F, 6, 3)

    # S = blockdiag(U_l) - sum_p sum_{a,b} Y_pa W_pb^T at (cam_a, cam_b)
    contrib = jnp.einsum("paij,pbkj->pabik", y, w)  # (P, F, F, 6, 6)
    ca = jnp.broadcast_to(cam_of[:, :, None], (p, f, f)).reshape(-1)
    cb = jnp.broadcast_to(cam_of[:, None, :], (p, f, f)).reshape(-1)
    s = jnp.zeros((c, c, 6, 6), dtype)
    s = s.at[ca, cb].add(contrib.reshape(-1, 6, 6))
    s = -s
    s = s.at[jnp.arange(c), jnp.arange(c)].add(u_l)

    # rhs_c = g_c - sum_p Y_pa g_p
    rhs_contrib = jnp.einsum("pfij,pj->pfi", y, g_p)  # (P, F, 6)
    rhs = g_c - jax.ops.segment_sum(
        rhs_contrib.reshape(-1, 6), cam_of.reshape(-1), c
    )
    return s, rhs, v_inv, w, cam_of, g_p


def _solve_cameras(s, rhs, fixed):
    """Dense solve of the reduced camera system with gauge freezing."""
    c = rhs.shape[0]
    dtype = rhs.dtype
    free = (~fixed).astype(dtype)
    # Zero rows/cols of fixed cameras, identity on their diagonal.
    mask2 = free[:, None] * free[None, :]
    s = s * mask2[:, :, None, None]
    eye6 = jnp.eye(6, dtype=dtype)
    s = s.at[jnp.arange(c), jnp.arange(c)].add(
        (1.0 - free)[:, None, None] * eye6
    )
    rhs = rhs * free[:, None]
    a = jnp.transpose(s, (0, 2, 1, 3)).reshape(c * 6, c * 6)
    delta = jnp.linalg.solve(a, rhs.reshape(-1))
    return delta.reshape(c, 6)


def _back_substitute(v_inv, w, cam_of, g_p, delta_c):
    """delta_p = V^-1 (g_p - sum_a W_pa^T delta_c[cam_a])."""
    dc = delta_c[cam_of]  # (P, F, 6)
    acc = jnp.einsum("pfij,pfi->pj", w, dc)  # (P, 3)
    return jnp.einsum("pij,pj->pi", v_inv, g_p - acc)


@partial(jax.jit, donate_argnums=(), static_argnums=(2,))
def ba_step(pr: BAProblem, lam: jnp.ndarray, huber_delta: float | None = None):
    """One damped Gauss-Newton (LM) step; returns candidate (cams, points)."""
    r, jc, jp = _jacobians(pr, pr.cams, pr.points)
    if huber_delta is not None:
        sw = _huber_sqrt_weights(r, huber_delta)
        r = r * sw[:, None]
        jc = jc * sw[:, None, None]
        jp = jp * sw[:, None, None]
    s, rhs, v_inv, w, cam_of, g_p = _schur_reduce(pr, jc, jp, r, lam)
    delta_c = _solve_cameras(s, rhs, pr.fixed_cams)
    delta_p = _back_substitute(v_inv, w, cam_of, g_p, delta_c)
    return pr.cams + delta_c, pr.points + delta_p


def ba_solve(pr: BAProblem, iters: int = 20, lam0: float = 1e-3,
             huber_delta: float | None = None):
    """LM loop with accept/reject and damping schedule (host-controlled).

    ``huber_delta`` (pixels): robustify with a Huber loss (IRLS weights in
    every step, Huber objective in the accept/reject test).  None keeps the
    plain L2 objective.  Returns (cams, points, info dict with cost trace).
    """
    cost_fn = jax.jit(
        lambda p, c, x: _cost(p, c, x, huber_delta), static_argnums=()
    )
    lam = lam0
    cost = float(cost_fn(pr, pr.cams, pr.points))
    trace = [cost]
    for _ in range(iters):
        cams_new, pts_new = ba_step(
            pr, jnp.asarray(lam, pr.cams.dtype), huber_delta
        )
        new_cost = float(cost_fn(pr, cams_new, pts_new))
        if new_cost < cost and np.isfinite(new_cost):
            pr = dataclasses.replace(pr, cams=cams_new, points=pts_new)
            cost = new_cost
            lam = max(lam * 0.5, 1e-9)
        else:
            lam = min(lam * 4.0, 1e6)
        trace.append(cost)
    return pr.cams, pr.points, {"cost_trace": trace, "final_lam": lam}
