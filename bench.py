"""Headline benchmark: SIFT detect+describe+match throughput at 640x480.

Prints ONE JSON line:
  {"metric": "sift_detect_describe_match_640x480", "value": <fps>,
   "unit": "frames/s/chip", "vs_baseline": <speedup vs C++ reference>}

Baseline (BASELINE.md): the C++ reference runs ~0.0104 frames/s on one CPU
core (77.6 s + 114.8 s detect for the CAVE-01 pair + 61 ms match ->
2 frames / 192.46 s).  vs_baseline = fps / 0.010392.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 2.0 / (77.6 + 114.8 + 0.0614)  # 0.010392 frames/s (BASELINE.md)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    os.makedirs("/root/.cache/jax_tpu_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sift_tpu import SiftConfig, detect_and_describe, match_descriptors
    from sift_tpu.utils.io import load_image

    cave = "/root/reference/stitching/collection/Dataset/CAVE-01_atrium"
    try:
        img1 = load_image(f"{cave}/00.jpg")
        img2 = load_image(f"{cave}/01.jpg")
    except Exception:
        rng = np.random.default_rng(0)
        img1 = rng.uniform(0, 255, (480, 640, 3)).astype(np.float32)
        img2 = rng.uniform(0, 255, (480, 640, 3)).astype(np.float32)

    cfg = SiftConfig()

    def frame_pair():
        kp1 = detect_and_describe(img1, cfg)
        kp2 = detect_and_describe(img2, cfg)
        idx, accept, _, _ = match_descriptors(
            kp1.desc, kp1.valid, kp2.desc, kp2.valid, cfg.ratio_threshold
        )
        return accept

    # Warmup / compile.
    acc = frame_pair()
    jax.block_until_ready(acc)

    # Timed: n pair-iterations = 2n frames of detect+describe plus n matches.
    n = 15
    t0 = time.time()
    for _ in range(n):
        acc = frame_pair()
    jax.block_until_ready(acc)
    dt = time.time() - t0
    fps = (2 * n) / dt

    print(
        json.dumps(
            {
                "metric": "sift_detect_describe_match_640x480",
                "value": round(fps, 3),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
