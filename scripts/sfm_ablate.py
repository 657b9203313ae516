"""SfM ablation harness: detect+match once, compare pipeline variants.

Renders the eval trajectories (tests/test_sfm_images.render_sequence),
runs detection+matching a single time per sequence, then evaluates
run_sfm_from_matches under several configurations (geometric verification
on/off, window sizes) against ground truth.  Used to attribute accuracy
deltas to the SfM stage rather than upstream keypoint changes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--seqs", default="sweep,loop")
    ap.add_argument("--variants", default="off,on")
    ap.add_argument("--window", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs("/root/.cache/jax_test_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from test_sfm_images import render_sequence

    from sift_tpu import SiftConfig, detect_and_describe, match_descriptors
    from sift_tpu.models.sfm import run_sfm_from_matches
    from sfm_eval import _metrics, _recover_centers

    k = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]])
    cfg = SiftConfig(dtype=jnp.float32, extrema_cap=2048, kp_cap=1024,
                     ori_cap=2048)
    n = args.frames
    base = 1.6 / max(n, 16)
    seqs = {}
    if "sweep" in args.seqs:
        seqs[f"sweep-{n}"] = [f * base for f in range(n)]
    if "loop" in args.seqs:
        half = max(n // 2, 4)
        seqs[f"loop-{2 * half - 1}"] = [f * base for f in range(half)] + [
            (half - 2 - f) * base for f in range(half - 1)
        ]
    if "bigloop" in args.seqs:
        # 100+ frame loop: out, back, and out again (two revisit passes)
        half = max(n // 3, 4)
        seqs[f"bigloop-{3 * half - 2}"] = (
            [f * base for f in range(half)]
            + [(half - 2 - f) * base for f in range(half - 1)]
            + [(f + 1) * base for f in range(half - 1)]
        )

    for name, ts in seqs.items():
        frames, gt = render_sequence(ts=ts)
        kps = [detect_and_describe(f, cfg) for f in frames]
        uvs = [
            np.stack([np.asarray(kp.x), np.asarray(kp.y)], -1) for kp in kps
        ]
        pair_matches = {}
        for i in range(len(frames) - 1):
            for j in range(i + 1, min(i + 1 + args.window, len(frames))):
                idx, acc, _, _ = match_descriptors(
                    kps[i].desc, kps[i].valid, kps[j].desc, kps[j].valid,
                    cfg.ratio_threshold,
                )
                acc = np.asarray(acc)
                idx = np.asarray(idx)
                rows = np.nonzero(acc)[0]
                pair_matches[(i, j)] = np.stack([rows, idx[rows]], axis=-1)

        for variant in args.variants.split(","):
            t0 = time.time()
            res = run_sfm_from_matches(
                uvs, pair_matches, k, ba_iters=20,
                verify_pairs=(variant == "on"),
            )
            m = _metrics(_recover_centers(res, len(frames)), gt)
            m.update(
                seq=name, verify=variant, seconds=round(time.time() - t0, 1),
                points=res.info["n_points"], obs=res.info["n_obs"],
                pruned=res.info.get("pruned_obs", 0),
            )
            print(json.dumps(m), flush=True)


if __name__ == "__main__":
    main()
