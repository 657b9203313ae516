"""Own-collection floor scene, resumable: per-image keypoint caching so the
run can be chunked (CPU) or survive tunnel outages (TPU).

Usage:
  python scripts/render_own.py detect [--from 0 --to 9] [--downscale 2]
  python scripts/render_own.py stitch [--downscale 2] [--out artifacts/...]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OWN = "/root/reference/stitching/collection/own"
CACHE = "/tmp/own_kp_cache"


def _files():
    return sorted(glob.glob(f"{OWN}/*.jpg"))


def _kp_path(i, ds):
    return f"{CACHE}/kp_{i:02d}_ds{ds}.npz"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["detect", "stitch"])
    ap.add_argument("--from", dest="i0", type=int, default=0)
    ap.add_argument("--to", dest="i1", type=int, default=99)
    ap.add_argument("--downscale", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="artifacts/own_floor_panorama.png")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        os.makedirs("/root/.cache/jax_tpu_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_tpu_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from sift_tpu import SiftConfig
    from sift_tpu.utils.checkpoint import load_keypoints, save_keypoints
    from sift_tpu.utils.io import load_image

    os.makedirs(CACHE, exist_ok=True)
    cfg = SiftConfig(dtype=jnp.float32)
    files = _files()
    ds = args.downscale

    if args.phase == "detect":
        from sift_tpu import detect_and_describe

        for i in range(args.i0, min(args.i1 + 1, len(files))):
            path = _kp_path(i, ds)
            if os.path.exists(path):
                continue
            t0 = time.time()
            kp = detect_and_describe(load_image(files[i])[::ds, ::ds], cfg)
            save_keypoints(path, kp)
            print(f"{i}: {int(np.asarray(kp.valid).sum())} kp "
                  f"in {time.time() - t0:.1f}s", flush=True)
        return

    # stitch phase
    from sift_tpu.models.stitch import (
        composite, match_points, ransac_homography,
    )

    kps = [load_keypoints(_kp_path(i, ds)) for i in range(len(files))]
    imgs = [load_image(f)[::ds, ::ds] for f in files]
    n = len(imgs)
    center = n // 2
    hs = {}
    for i in range(n - 1):  # chain graph, toward center
        p1, p2, ok = match_points(kps[i], kps[i + 1], cfg.ratio_threshold)
        h, _, n_inl = ransac_homography(p1, p2, ok, 2048)
        hs[(i, i + 1)] = np.asarray(h, np.float64)
        print(f"edge {i}-{i+1}: {int(np.asarray(n_inl))} inliers", flush=True)

    h_center = {center: np.eye(3)}
    for i in range(center - 1, -1, -1):
        h_center[i] = h_center[i + 1] @ hs[(i, i + 1)]
    for i in range(center + 1, n):
        h_center[i] = h_center[i - 1] @ np.linalg.inv(hs[(i - 1, i)])

    order = sorted(h_center)
    pano = composite(
        [np.asarray(imgs[i], np.float32) for i in order],
        [h_center[i] for i in order],
    )
    stride = max(1, int(np.ceil(max(pano.shape[:2]) / 1600)))
    from sift_tpu.utils.io import save_image

    save_image(args.out, pano[::stride, ::stride])
    print(f"wrote {args.out} ({pano.shape[1]//stride}x{pano.shape[0]//stride})")


if __name__ == "__main__":
    main()
