"""Command-line entry point.

Rebuild of the reference CLI (src/main.cpp:6-20): ``sift <image1> <image2>``
loads two images, detects keypoints + descriptors, matches them, and writes
``keypoints1.png``, ``keypoints2.png`` and ``matches.png``.  Unlike the
reference, artifact writing is explicit here, not buried in the detect call,
and all knobs are exposed as flags (the reference hardcodes defaults).

Usage:
    python -m sift_tpu <image1> <image2> [--out-dir DIR] [--ratio 0.75] ...
    python -m sift_tpu stitch <scene_dir> [--out panorama.png]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sift_tpu", description="TPU-native SIFT detect + match"
    )
    p.add_argument("image1")
    p.add_argument("image2")
    p.add_argument("--out-dir", default=".")
    p.add_argument("--ratio", type=float, default=0.75)
    p.add_argument("--no-double", action="store_true",
                   help="disable initial 2x upsampling")
    p.add_argument("--sigma", type=float, default=1.6)
    p.add_argument("--intervals", type=int, default=3)
    p.add_argument("--contrast-threshold", type=float, default=0.04)
    p.add_argument("--eigen-ratio", type=float, default=10.0)
    p.add_argument("--f64", action="store_true",
                   help="float64 parity profile (CPU)")
    p.add_argument("--no-draw", action="store_true")
    p.add_argument("--json", action="store_true", help="print JSON summary")
    return p


def stitch_main(argv) -> int:
    """``sift_tpu stitch <scene_dir>``: multi-image panorama.

    The scene directory holds numbered images (00.jpg, 01.jpg, ...) and
    optionally a ``*-STITCH-GRAPH.txt`` match graph; without one, a chain
    graph over consecutive images centered on the middle image is used.
    """
    import glob

    p = argparse.ArgumentParser(prog="sift_tpu stitch")
    p.add_argument("scene_dir")
    p.add_argument("--out", default="panorama.png")
    p.add_argument("--hypotheses", type=int, default=2048)
    args = p.parse_args(argv)

    from sift_tpu.models.stitch import stitch_scene
    from sift_tpu.utils.io import load_image, save_image
    from sift_tpu.utils.stitch_graph import StitchGraph, parse_stitch_graph

    graphs = glob.glob(os.path.join(args.scene_dir, "*-STITCH-GRAPH.txt"))
    images = sorted(
        f for f in glob.glob(os.path.join(args.scene_dir, "*"))
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    imgs = [load_image(f) for f in images]
    if graphs:
        graph = parse_stitch_graph(graphs[0])
        if graph.images_count > len(imgs):
            print(
                f"warning: graph declares {graph.images_count} images, "
                f"found {len(imgs)}; stitching the available subset"
            )
            graph = graph.subset(len(imgs))
    else:
        n = len(imgs)
        graph = StitchGraph(
            center_index=n // 2, center_rotation=0.0, images_count=n,
            edges=tuple((i, i + 1) for i in range(n - 1)),
        )
    pano = stitch_scene(imgs, graph, num_hypotheses=args.hypotheses)
    save_image(args.out, pano)
    print(f"{args.out}: {pano.shape[1]}x{pano.shape[0]} from {len(imgs)} images")
    return 0


def _warn_capacity_overflow(counts, cfg) -> None:
    """Busy images can exceed the fixed stage capacities; the fused pipeline
    then keeps the first CAP detections (in scan order) instead of erroring.
    Check the true per-stage counts and tell the user to raise the caps
    (SiftConfig(extrema_cap=..., kp_cap=..., ori_cap=...)) when clipped."""
    import sys

    import numpy as np

    from sift_tpu.models.detect import refine_cascade_caps

    from sift_tpu.models.sift import ORI_CAND_SLOTS

    checks = [
        ("extrema", cfg.extrema_cap, np.asarray(counts["extrema"])),
        ("refined", cfg.kp_cap, np.asarray(counts["refined"])),
        ("oriented", cfg.ori_cap, np.asarray(counts["oriented"])),
        ("ori_slots_max", ORI_CAND_SLOTS,
         np.asarray(counts["ori_slots_max"])),
    ]
    ract = np.asarray(counts["refine_active"])  # (..., phases)
    for p, (cap_p, _steps) in enumerate(refine_cascade_caps(cfg, cfg.extrema_cap)):
        checks.append((f"refine_active[{p}]", cap_p, ract[..., p]))
    for name, cap, c in checks:
        mx = int(c.max())
        if mx > cap:
            print(
                f"warning: {name} count {mx} exceeds capacity {cap}; "
                f"detections were clipped — raise SiftConfig caps",
                file=sys.stderr,
            )


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "stitch":
        return stitch_main(argv[1:])
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.f64:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from sift_tpu import SiftConfig, detect_and_describe, match_descriptors
    from sift_tpu.utils import draw
    from sift_tpu.utils.io import load_image, save_image

    cfg = SiftConfig(
        double_image_size=not args.no_double,
        init_sigma=args.sigma,
        intervals=args.intervals,
        contrast_threshold=args.contrast_threshold,
        eigen_ratio=args.eigen_ratio,
        ratio_threshold=args.ratio,
        dtype=jnp.float64 if args.f64 else jnp.float32,
    )

    t0 = time.time()
    img1 = load_image(args.image1)
    img2 = load_image(args.image2)
    if img1.shape == img2.shape:
        # One batched run also yields the true per-stage counts for the
        # capacity-overflow warning at no extra cost.
        from sift_tpu.models.sift import detect_and_describe_batch

        both, counts = detect_and_describe_batch(
            np.stack([img1, img2]), cfg, return_counts=True
        )
        kp1 = jax.tree.map(lambda a: a[0], both)
        kp2 = jax.tree.map(lambda a: a[1], both)
        _warn_capacity_overflow(counts, cfg)
    else:
        kp1 = detect_and_describe(img1, cfg)
        kp2 = detect_and_describe(img2, cfg)
    idx, accept, best, _ = match_descriptors(
        kp1.desc, kp1.valid, kp2.desc, kp2.valid, cfg.ratio_threshold
    )
    jax.block_until_ready(accept)
    elapsed = time.time() - t0

    accept_np = np.asarray(accept)
    idx_np = np.asarray(idx)
    lanes = np.nonzero(accept_np)[0]
    pairs = [
        ((float(kp1.x[i]), float(kp1.y[i])), (float(kp2.x[idx_np[i]]), float(kp2.y[idx_np[i]])))
        for i in lanes
    ]

    n1, n2 = int(kp1.count()), int(kp2.count())
    summary = dict(
        keypoints1=n1, keypoints2=n2, matches=len(pairs), seconds=elapsed
    )
    if args.json:
        print(json.dumps(summary))
    else:
        print(f"keypoints: {n1} / {n2}; matches: {len(pairs)} in {elapsed:.2f}s")

    if not args.no_draw:
        os.makedirs(args.out_dir, exist_ok=True)
        scales = cfg.intervals + 3
        save_image(
            os.path.join(args.out_dir, "keypoints1.png"),
            draw.draw_keypoints(img1, kp1.to_numpy(), scales),
        )
        save_image(
            os.path.join(args.out_dir, "keypoints2.png"),
            draw.draw_keypoints(img2, kp2.to_numpy(), scales),
        )
        save_image(
            os.path.join(args.out_dir, "matches.png"),
            draw.draw_matches(img1, img2, pairs),
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
