"""Whole-scene bit-parity audit vs the reference binary.

For every frame of a scene with oracle dumps (tests/data/scene_oracle/,
produced by tests/oracle/harness.cpp over the unmodified reference), run the
f64 parity pipeline on the oracle's own decoded pixels and verify:

  1. final keypoint sets are identical (x, y, size exact; pori @ 1e-9),
  2. all descriptor bytes are identical,
  3. the Lowe-ratio match set along every STITCH-GRAPH edge equals the
     reference's (exact integer matcher on both sides).

Prints one JSON line per frame/edge and a final summary.  Offline tool — the
per-pair versions of these checks run in the test suite
(tests/test_parity_e2e.py); this sweeps the complete scene graph.

Usage: python scripts/verify_scene_parity.py [--limit N]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=0, help="first N frames only")
    ap.add_argument(
        "--scene-oracle",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests", "data", "scene_oracle",
        ),
    )
    ap.add_argument(
        "--graph",
        default=(
            "/root/reference/stitching/collection/Dataset/CAVE-01_atrium/"
            "CAVE-01_atrium-STITCH-GRAPH.txt"
        ),
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_disable_hlo_passes=fusion"
    )
    cache = "/root/.cache/jax_test_cache"
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from sift_tpu import SiftConfig, match_descriptors
    from sift_tpu.models.sift import detect_stages
    from sift_tpu.utils.stitch_graph import parse_stitch_graph

    cfg = SiftConfig(dtype=jnp.float64)
    dumps = sorted(glob.glob(os.path.join(args.scene_oracle, "*.npz")))
    if args.limit:
        dumps = dumps[: args.limit]

    def oracle_dict(npz):
        d = dict(np.load(npz))
        out = {}
        for i in range(len(d["final.x"])):
            key = (
                float(d["final.x"][i]), float(d["final.y"][i]),
                float(d["final.size"][i]), round(float(d["final.pori"][i]), 9),
            )
            out[key] = d["final.desc"][i]
        return d, out

    kps = {}
    frames_ok = 0
    for path in dumps:
        frame = int(os.path.basename(path).split("_")[-1].split(".")[0])
        d, ref = oracle_dict(path)
        img = d["input"].astype(np.float64)
        octaves = cfg.octaves_count(img.shape[1] * 2, img.shape[0] * 2)
        kp = detect_stages(jnp.asarray(img), cfg, octaves)["final"]
        kps[frame] = (kp, ref)
        v = np.asarray(kp.valid)
        mine = {}
        for i in np.nonzero(v)[0]:
            mine[(
                float(kp.x[i]), float(kp.y[i]), float(kp.size[i]),
                round(float(kp.pori[i]), 9),
            )] = np.asarray(kp.desc[i])
        keys_equal = set(mine) == set(ref)
        byte_diffs = (
            sum(int((mine[k] != ref[k]).sum()) for k in ref) if keys_equal else -1
        )
        ok = keys_equal and byte_diffs == 0
        frames_ok += ok
        print(json.dumps(dict(
            frame=frame, keypoints=len(ref), keys_equal=keys_equal,
            desc_byte_diffs=byte_diffs, ok=bool(ok),
        )), flush=True)

    graph = parse_stitch_graph(args.graph)
    edges_ok = 0
    edges_total = 0
    for (i, j) in graph.edges:
        if i not in kps or j not in kps:
            continue
        edges_total += 1
        (kpa, ra), (kpb, rb) = kps[i], kps[j]
        idx, acc, _, _ = match_descriptors(kpa.desc, kpa.valid, kpb.desc, kpb.valid)
        mine_count = int(np.asarray(acc).sum())

        da = np.stack(list(ra.values())).astype(np.int64)
        db = np.stack(list(rb.values())).astype(np.int64)
        d2 = ((da * da).sum(1)[:, None] + (db * db).sum(1)[None, :]
              - 2 * (da @ db.T))
        bi = d2.argmin(1)
        best = d2[np.arange(len(da)), bi]
        d2m = d2.copy()
        d2m[np.arange(len(da)), bi] = 1 << 60
        acc_ref = 16 * best < 9 * d2m.min(1)
        ok = mine_count == int(acc_ref.sum())
        edges_ok += ok
        print(json.dumps(dict(
            edge=[i, j], matches=mine_count, ref_matches=int(acc_ref.sum()),
            ok=bool(ok),
        )), flush=True)

    print(json.dumps(dict(
        summary=True, frames=len(dumps), frames_ok=frames_ok,
        edges=edges_total, edges_ok=edges_ok,
    )))


if __name__ == "__main__":
    main()
