"""End-to-end scene throughput: native threaded decode -> batched TPU
detection -> pairwise matching along the scene graph.

This is the serving-shaped workload: the C++ loader (csrc/) prefetches and
decodes JPEGs on host threads while the TPU runs the batched pipeline, and
matching consumes descriptors straight from device memory.  Prints one JSON
line with end-to-end frames/s including IO.

Usage: python scripts/scene_throughput.py [scene_dir] [--batch 8]

Note on numbers: through the shared axon TPU tunnel, host<->device traffic
and dispatch latency dominate (and vary with co-tenants); on directly
attached TPU hosts the pipeline runs at the batched detection rate
(see bench.py: >1700 frames/s device-side).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SCENE = (
    "/root/reference/stitching/collection/Dataset/CAVE-01_atrium"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("scene_dir", nargs="?", default=DEFAULT_SCENE)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--threads", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    os.makedirs("/root/.cache/jax_tpu_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sift_tpu import SiftConfig, match_descriptors
    from sift_tpu.models.sift import detect_and_describe_batch
    from sift_tpu.utils import native

    paths = sorted(glob.glob(os.path.join(args.scene_dir, "*.jpg")))
    if not paths:
        raise SystemExit(f"no jpgs in {args.scene_dir}")
    cfg = SiftConfig()

    matcher = jax.jit(
        jax.vmap(match_descriptors, in_axes=(0, 0, 0, 0, None)),
        static_argnums=(4,),
    )
    PAIR_CHUNK = 4

    # Warm the compiled programs on one batch (not timed).
    warm = native.decode_image(paths[0]).astype(np.uint8)
    warm_b = np.stack([warm] * args.batch)
    kp = detect_and_describe_batch(jax.device_put(warm_b), cfg)
    w = matcher(
        kp.desc[:PAIR_CHUNK], kp.valid[:PAIR_CHUNK],
        kp.desc[:PAIR_CHUNK], kp.valid[:PAIR_CHUNK], cfg.ratio_threshold,
    )
    jax.block_until_ready(w)

    t0 = time.time()
    loader = native.ImageLoader(paths, n_threads=args.threads)
    all_desc = []
    all_valid = []
    batch: list[np.ndarray] = []
    n_frames = 0
    def feed(stack_u8):
        # Ship uint8 and cast on device: 4x less host->device traffic.
        return detect_and_describe_batch(jax.device_put(stack_u8), cfg)

    for img in loader:
        batch.append(img.astype(np.uint8))
        if len(batch) == args.batch:
            kp = feed(np.stack(batch))
            all_desc.append(kp.desc)
            all_valid.append(kp.valid)
            n_frames += len(batch)
            batch = []
    if batch:
        pad = [batch[-1]] * (args.batch - len(batch))
        kp = feed(np.stack(batch + pad))
        all_desc.append(kp.desc[: len(batch)])
        all_valid.append(kp.valid[: len(batch)])
        n_frames += len(batch)

    desc = jnp.concatenate(all_desc)
    valid = jnp.concatenate(all_valid)
    # Consecutive-pair matching across the whole scene, in fixed-size chunks
    # of the warmed vmapped program (bounds the (chunk, N, N) distance HBM).
    n_pairs = n_frames - 1
    accepts = []
    for s in range(0, n_pairs, PAIR_CHUNK):
        ia = np.arange(s, min(s + PAIR_CHUNK, n_pairs))
        if len(ia) < PAIR_CHUNK:  # pad to reuse the compiled chunk program
            ia = np.concatenate([ia, np.full(PAIR_CHUNK - len(ia), ia[-1])])
        _, acc, _, _ = matcher(
            desc[ia], valid[ia], desc[ia + 1], valid[ia + 1],
            cfg.ratio_threshold,
        )
        accepts.append(acc)
    jax.block_until_ready(accepts[-1])
    dt = time.time() - t0

    # Host reads only after timing (tunnel D2H degrades dispatch latency).
    match_counts = np.concatenate(
        [np.asarray(a).sum(axis=1) for a in accepts]
    )[:n_pairs].tolist()
    print(
        json.dumps(
            {
                "scene": os.path.basename(args.scene_dir.rstrip("/")),
                "frames": n_frames,
                "pairs_matched": n_pairs,
                "seconds_incl_io": round(dt, 3),
                "frames_per_s_incl_io": round(n_frames / dt, 1),
                "median_pair_matches": int(np.median(match_counts)),
            }
        )
    )


if __name__ == "__main__":
    main()
