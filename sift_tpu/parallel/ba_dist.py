"""Distributed bundle adjustment: point-sharded Schur reduction with psum.

The BA normal-equation assembly (models/ba._schur_reduce) is a pure
reduction over points/observations, so it shards cleanly: each device owns a
slice of the points and their observations, computes partial camera-block
Hessians (U), gradients and Schur contributions, and the partials are
``psum``-ed over the ``kp`` mesh axis (ICI on real hardware).  The reduced
(6C, 6C) camera solve is tiny and runs replicated; point back-substitution
is local to each shard.  This is the "BA Hessian-block psum over ICI"
configuration from BASELINE.json.

All entry points are jitted once per (mesh, shapes) — the LM loop reuses the
compiled step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from sift_tpu.models import ba as B
from sift_tpu.models.ba import BAProblem, build_obs_by_point


def shard_ba_problem(
    cams: np.ndarray,
    points: np.ndarray,
    obs_cam: np.ndarray,
    obs_pt: np.ndarray,
    obs_uv: np.ndarray,
    n_shards: int,
    fxy: np.ndarray,
    cxy: np.ndarray,
    fixed_cams: np.ndarray,
    dtype=jnp.float32,
):
    """Host-side prep: round-robin points over shards, group each point's
    observations into its shard, pad all shards to equal static sizes.

    Returns (dict of sharded arrays with a leading shard axis on point/obs
    arrays, (shard_of, local_idx)) where points[global] lives at
    (shard_of[g], local_idx[g]).
    """
    p_total = len(points)
    shard_of = np.arange(p_total) % n_shards
    local_idx = np.zeros(p_total, np.int64)
    p_max = 0
    for s in range(n_shards):
        ids = np.nonzero(shard_of == s)[0]
        local_idx[ids] = np.arange(len(ids))
        p_max = max(p_max, len(ids))
    p_max = max(p_max, 1)

    obs_shard = shard_of[obs_pt]
    o_max = max(int(np.bincount(obs_shard, minlength=n_shards).max()), 1)

    s_points = np.zeros((n_shards, p_max, 3), np.float64)
    s_pmask = np.zeros((n_shards, p_max), bool)
    s_obs_cam = np.zeros((n_shards, o_max), np.int32)
    s_obs_pt = np.zeros((n_shards, o_max), np.int32)
    s_obs_uv = np.zeros((n_shards, o_max, 2), np.float64)
    s_obs_mask = np.zeros((n_shards, o_max), bool)
    tbls = []
    f_max = 1
    for s in range(n_shards):
        pids = np.nonzero(shard_of == s)[0]
        s_points[s, : len(pids)] = points[pids]
        s_pmask[s, : len(pids)] = True
        oids = np.nonzero(obs_shard == s)[0]
        s_obs_cam[s, : len(oids)] = obs_cam[oids]
        s_obs_pt[s, : len(oids)] = local_idx[obs_pt[oids]]
        s_obs_uv[s, : len(oids)] = obs_uv[oids]
        s_obs_mask[s, : len(oids)] = True
        tbl = build_obs_by_point(s_obs_pt[s, : len(oids)], p_max)
        tbls.append(tbl)
        f_max = max(f_max, tbl.shape[1])
    s_tbl = np.full((n_shards, p_max, f_max), -1, np.int32)
    for s, tbl in enumerate(tbls):
        s_tbl[s, :, : tbl.shape[1]] = tbl

    sp = dict(
        cams=jnp.asarray(cams, dtype),
        points=jnp.asarray(s_points, dtype),
        pmask=jnp.asarray(s_pmask),
        obs_cam=jnp.asarray(s_obs_cam),
        obs_pt=jnp.asarray(s_obs_pt),
        obs_uv=jnp.asarray(s_obs_uv, dtype),
        obs_mask=jnp.asarray(s_obs_mask),
        obs_by_point=jnp.asarray(s_tbl),
        fxy=jnp.asarray(fxy, dtype),
        cxy=jnp.asarray(cxy, dtype),
        fixed_cams=jnp.asarray(fixed_cams),
    )
    return sp, (shard_of, local_idx)


def _problem(cams, points, obs_cam, obs_pt, obs_uv, obs_mask, tbl, fxy, cxy, fixed):
    return BAProblem(
        cams=cams, points=points, obs_cam=obs_cam, obs_pt=obs_pt,
        obs_uv=obs_uv, obs_mask=obs_mask, obs_by_point=tbl,
        fxy=fxy, cxy=cxy, fixed_cams=fixed,
    )


def _step_body(lam, cams, points, pmask, obs_cam, obs_pt, obs_uv, obs_mask,
               tbl, fxy, cxy, fixed):
    """Per-device body of one LM step (leading shard axis squeezed)."""
    points = points[0]
    pmask = pmask[0]
    obs_cam = obs_cam[0]
    obs_pt = obs_pt[0]
    obs_uv = obs_uv[0]
    obs_mask = obs_mask[0]
    tbl = tbl[0]
    p_local = points.shape[0]
    c = cams.shape[0]
    dtype = cams.dtype

    pr = _problem(cams, points, obs_cam, obs_pt, obs_uv, obs_mask, tbl, fxy, cxy, fixed)
    r, jc, jp = B._jacobians(pr, cams, points)
    cost = jax.lax.psum(jnp.sum(r * r), "kp")

    jtj_c = jnp.einsum("oki,okj->oij", jc, jc)
    jtj_p = jnp.einsum("oki,okj->oij", jp, jp)
    g_c_o = jnp.einsum("oki,ok->oi", jc, r)
    g_p_o = jnp.einsum("oki,ok->oi", jp, r)

    u = jax.lax.psum(jax.ops.segment_sum(jtj_c, obs_cam, c), "kp")
    g_c = -jax.lax.psum(jax.ops.segment_sum(g_c_o, obs_cam, c), "kp")
    v = jax.ops.segment_sum(jtj_p, obs_pt, p_local)
    g_p = -jax.ops.segment_sum(g_p_o, obs_pt, p_local)

    eye6 = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    u_l = u + lam * (u * eye6) + 1e-9 * eye6
    v_l = v + lam * (v * eye3) + 1e-9 * eye3
    v_inv = jnp.linalg.inv(v_l)

    f = tbl.shape[1]
    tmask = (tbl >= 0).astype(dtype)
    tbl_c = jnp.maximum(tbl, 0)
    w = jnp.einsum("pfki,pfkj->pfij", jc[tbl_c], jp[tbl_c])
    w = w * tmask[:, :, None, None]
    cam_of = obs_cam[tbl_c]
    y = jnp.einsum("pfij,pjk->pfik", w, v_inv)

    contrib = jnp.einsum("paij,pbkj->pabik", y, w)
    ca = jnp.broadcast_to(cam_of[:, :, None], (p_local, f, f)).reshape(-1)
    cb = jnp.broadcast_to(cam_of[:, None, :], (p_local, f, f)).reshape(-1)
    s_part = jnp.zeros((c, c, 6, 6), dtype)
    s_part = s_part.at[ca, cb].add(contrib.reshape(-1, 6, 6))
    rhs_part = jax.ops.segment_sum(
        jnp.einsum("pfij,pj->pfi", y, g_p).reshape(-1, 6), cam_of.reshape(-1), c
    )

    s = -jax.lax.psum(s_part, "kp")
    s = s.at[jnp.arange(c), jnp.arange(c)].add(u_l)
    rhs = g_c - jax.lax.psum(rhs_part, "kp")

    delta_c = B._solve_cameras(s, rhs, fixed)
    delta_p = B._back_substitute(v_inv, w, cam_of, g_p, delta_c)
    delta_p = delta_p * pmask[:, None].astype(dtype)
    return cams + delta_c, (points + delta_p)[None], cost


def _cost_body(cams, points, obs_cam, obs_pt, obs_uv, obs_mask, tbl, fxy, cxy, fixed):
    pr = _problem(
        cams, points[0], obs_cam[0], obs_pt[0], obs_uv[0], obs_mask[0],
        tbl[0], fxy, cxy, fixed,
    )
    r, _ = B._residuals(pr, cams, points[0])
    return jax.lax.psum(jnp.sum(r * r), "kp")


_SHARD = P("kp")
_REP = P()


@partial(jax.jit, static_argnums=(0,))
def _sharded_step_jit(mesh: Mesh, lam, cams, points, pmask, obs_cam, obs_pt,
                      obs_uv, obs_mask, tbl, fxy, cxy, fixed):
    fn = shard_map(
        _step_body,
        mesh=mesh,
        in_specs=(_REP, _REP, _SHARD, _SHARD, _SHARD, _SHARD, _SHARD, _SHARD,
                  _SHARD, _REP, _REP, _REP),
        out_specs=(_REP, _SHARD, _REP),
        check_vma=False,
    )
    return fn(lam, cams, points, pmask, obs_cam, obs_pt, obs_uv, obs_mask,
              tbl, fxy, cxy, fixed)


@partial(jax.jit, static_argnums=(0,))
def _sharded_cost_jit(mesh: Mesh, cams, points, obs_cam, obs_pt, obs_uv,
                      obs_mask, tbl, fxy, cxy, fixed):
    fn = shard_map(
        _cost_body,
        mesh=mesh,
        in_specs=(_REP, _SHARD, _SHARD, _SHARD, _SHARD, _SHARD, _SHARD,
                  _REP, _REP, _REP),
        out_specs=_REP,
        check_vma=False,
    )
    return fn(cams, points, obs_cam, obs_pt, obs_uv, obs_mask, tbl, fxy, cxy, fixed)


def sharded_ba_step(sp: dict, lam: float, mesh: Mesh):
    """One LM step; returns (new_cams, new_points (sharded), cost_before)."""
    return _sharded_step_jit(
        mesh, jnp.asarray(lam, sp["cams"].dtype), sp["cams"], sp["points"],
        sp["pmask"], sp["obs_cam"], sp["obs_pt"], sp["obs_uv"], sp["obs_mask"],
        sp["obs_by_point"], sp["fxy"], sp["cxy"], sp["fixed_cams"],
    )


def sharded_cost(sp: dict, mesh: Mesh):
    """Replicated total reprojection cost of a sharded problem."""
    return _sharded_cost_jit(
        mesh, sp["cams"], sp["points"], sp["obs_cam"], sp["obs_pt"],
        sp["obs_uv"], sp["obs_mask"], sp["obs_by_point"], sp["fxy"],
        sp["cxy"], sp["fixed_cams"],
    )


def sharded_ba_solve(sp: dict, mesh: Mesh, iters: int = 15, lam0: float = 1e-3):
    """LM loop around sharded_ba_step (host-controlled damping schedule)."""
    lam = lam0
    cost = float(sharded_cost(sp, mesh))
    trace = [cost]
    for _ in range(iters):
        cams_new, pts_new, _ = sharded_ba_step(sp, lam, mesh)
        cand = dict(sp)
        cand["cams"] = cams_new
        cand["points"] = pts_new
        new_cost = float(sharded_cost(cand, mesh))
        if new_cost < cost and np.isfinite(new_cost):
            sp = cand
            cost = new_cost
            lam = max(lam * 0.5, 1e-9)
        else:
            lam = min(lam * 4.0, 1e6)
        trace.append(cost)
    return sp, {"cost_trace": trace, "final_lam": lam}
