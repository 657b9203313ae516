"""Stage-by-stage ATE of the loop-closure flow on the bigloop sequence:
window-only base -> pose-graph relaxation -> re-triangulated final BA.
Isolates whether PGO corrects the drift and whether the final BA keeps it.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from sfm_eval import _metrics, _recover_centers
    from test_sfm_images import render_sequence

    from sift_tpu import SiftConfig, detect_and_describe, match_descriptors
    from sift_tpu.models.geometry import rodrigues
    from sift_tpu.models.sfm import (
        _normalize, _relative_rotation, loop_closure_candidates,
        pose_graph_relax, run_sfm_from_matches,
    )

    n = 50
    base_step = 1.6 / n
    seg = max((2 * n) // 3, 4)
    step3 = 1.6 / seg
    ts = (
        [f * step3 for f in range(seg)]
        + [(seg - 2 - f) * step3 for f in range(seg - 1)]
        + [(f + 1) * step3 for f in range(seg - 1)]
    )
    frames, gt = render_sequence(ts=ts)
    k = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]])
    cfg = SiftConfig(dtype=jnp.float32, extrema_cap=2048, kp_cap=1024,
                     ori_cap=2048)

    kps = [detect_and_describe(img, cfg) for img in frames]
    uvs = [np.stack([np.asarray(kp.x), np.asarray(kp.y)], -1) for kp in kps]

    def match_pair(i, j):
        idx, acc, _, _ = match_descriptors(
            kps[i].desc, kps[i].valid, kps[j].desc, kps[j].valid,
            cfg.ratio_threshold,
        )
        acc = np.asarray(acc)
        idx = np.asarray(idx)
        rows = np.nonzero(acc)[0]
        return np.stack([rows, idx[rows]], axis=-1)

    pair_matches = {}
    for i in range(len(frames) - 1):
        for j in range(i + 1, min(i + 3, len(frames))):
            pair_matches[(i, j)] = match_pair(i, j)

    base = run_sfm_from_matches(uvs, dict(pair_matches), k, 20)
    c = _recover_centers(base, len(frames))
    print("base:", {k2: round(v, 4) for k2, v in _metrics(c, gt).items()})

    reg = base.info["registered"]
    rm = np.asarray(rodrigues(jnp.asarray(base.poses[:, :3], jnp.float32)))
    centers = -np.einsum("nij,nj->ni", rm.transpose(0, 2, 1),
                         base.poses[:, 3:])
    rs = sorted(reg)
    path = float(sum(np.linalg.norm(centers[b] - centers[a])
                     for a, b in zip(rs, rs[1:])))
    descs = [np.asarray(kp.desc)[np.asarray(kp.valid)] for kp in kps]
    closures = []
    for (i, j) in loop_closure_candidates(descs, 8, min_sim=0.95):
        if (i, j) in pair_matches:
            continue
        gap = float(np.linalg.norm(centers[i] - centers[j]))
        if gap > 0.1 * path:
            continue
        m = match_pair(i, j)
        if len(m) < 24:
            continue
        q1 = _normalize(uvs[i][m[:, 0]], k)
        q2 = _normalize(uvs[j][m[:, 1]], k)
        closures.append((i, j, _relative_rotation(q1, q2)))
    print(f"closures: {len(closures)} pairs "
          f"{[(i, j) for i, j, _ in closures][:8]}...")

    t0 = time.time()
    poses_pgo = pose_graph_relax(base.poses, reg, closures)
    print(f"pgo: {time.time() - t0:.1f}s")
    from sift_tpu.models.sfm import SfmResult

    fake = SfmResult(poses=poses_pgo, points=base.points,
                     track_point=base.track_point, info={})
    c2 = _recover_centers(fake, len(frames))
    print("after PGO:", {k2: round(v, 4) for k2, v in _metrics(c2, gt).items()})

    out = run_sfm_from_matches(uvs, dict(pair_matches), k, 20,
                               poses_init=poses_pgo,
                               registered_init=sorted(reg))
    c3 = _recover_centers(out, len(frames))
    print("after refine BA:",
          {k2: round(v, 4) for k2, v in _metrics(c3, gt).items()},
          dict(points=out.info["n_points"], obs=out.info["n_obs"],
               pruned=out.info.get("pruned_obs", 0)))


if __name__ == "__main__":
    main()
