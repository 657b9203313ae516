"""(Re)render panorama artifacts from the reference scene collections.

THE scene entry point (round 5: render_own.py folded in here — per-scene
default capacities killed the own-scene footgun that required it).

Usage:
  python scripts/render_scene.py cave04_cyl [--out artifacts/...png]
  python scripts/render_scene.py cave01 | cave04 | nis02 | nis06 | own

Scenes stitch at full source resolution with the production pipeline
(detection on the TPU when available); outputs are downscaled to <=1600 px
per side for committing.  ``--cache`` makes runs resumable (per-image
detections + per-edge homographies persist across timeout-bounded runs).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATASET = "/root/reference/stitching/collection/Dataset"
# (dir, mode, big_caps_by_default): scenes whose full-res frames measure
# more detections than the default capacities hold get --big-caps behavior
# automatically — silent capacity clipping on e.g. the 12-Mpx own-floor
# frames (~288k extrema at full res) degrades the solve into a broken
# composite (the round-4 footgun that forced a separate render_own.py).
SCENES = {
    "cave01": (f"{DATASET}/CAVE-01_atrium", "planar", False),
    "cave04": (f"{DATASET}/CAVE-04_times_square", "planar", False),
    "cave04_cyl": (f"{DATASET}/CAVE-04_times_square", "cylindrical", False),
    "nis02": (f"{DATASET}/NISwGSP-02_SantaMaria-all", "planar", True),
    "nis06": (f"{DATASET}/NISwGSP-06_PalazzoPubblico", "planar", True),
    # own-collection floor sweep: no STITCH-GRAPH file; chain graph.
    "own": ("/root/reference/stitching/collection/own", "planar", True),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", choices=sorted(SCENES))
    ap.add_argument("--out", default=None)
    ap.add_argument("--downscale", type=int, default=1,
                    help="subsample input images by this stride")
    ap.add_argument("--no-seam", action="store_true",
                    help="legacy feather blending (ghosting comparison)")
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU (e.g. during a TPU tunnel outage)")
    ap.add_argument("--cache", action="store_true",
                    help="cache per-image detections (resume across runs)")
    ap.add_argument("--detect-only", type=int, default=-1, metavar="N",
                    help="with --cache: only detect the first N images, exit")
    ap.add_argument("--big-caps", action="store_true",
                    help="capacities for full-res (8+ Mpx) images: measured "
                         "NIS-02 counts are ~120k extrema / 15k refined / "
                         "18k oriented per frame (default caps clip those "
                         "silently and degrade the geometry)")
    ap.add_argument("--caps", type=int, nargs=3, metavar=("E", "K", "O"),
                    help="explicit extrema/kp/ori capacities (overrides "
                         "--big-caps); own full-res measures ~288k extrema")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import glob

    import numpy as np

    from sift_tpu.utils.io import load_image, save_image
    from sift_tpu.utils.stitch_graph import parse_stitch_graph

    scene_dir, mode, auto_big = SCENES[args.scene]
    if auto_big and args.downscale < 4 and not (args.big_caps or args.caps):
        print("note: full-res scene defaults to --big-caps (measured "
              "detection counts exceed the default capacities)")
        args.big_caps = True
    graph_files = glob.glob(os.path.join(scene_dir, "*-STITCH-GRAPH.txt"))
    files = sorted(
        f for f in glob.glob(os.path.join(scene_dir, "*"))
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    imgs = [load_image(f) for f in files]
    if args.downscale > 1:
        imgs = [im[:: args.downscale, :: args.downscale] for im in imgs]
    if graph_files:
        graph = parse_stitch_graph(graph_files[0])
        if graph.images_count > len(imgs):
            print(f"note: graph declares {graph.images_count} images, mount "
                  f"has {len(imgs)}; stitching the available subset")
            graph = graph.subset(len(imgs))
    else:
        from sift_tpu.utils.stitch_graph import StitchGraph

        n = len(imgs)
        graph = StitchGraph(
            center_index=n // 2, center_rotation=0.0, images_count=n,
            edges=tuple((i, i + 1) for i in range(n - 1)),
        )

    import jax.numpy as jnp

    from sift_tpu import SiftConfig

    caps = dict(extrema_cap=131072, kp_cap=20480, ori_cap=24576) \
        if args.big_caps else {}
    if args.caps:
        caps = dict(extrema_cap=args.caps[0], kp_cap=args.caps[1],
                    ori_cap=args.caps[2])
        args.big_caps = True  # big-canvas multiband + cache tag
    cfg = SiftConfig(dtype=jnp.float32, **caps)

    kps = None
    if args.cache:
        from sift_tpu import detect_and_describe
        from sift_tpu.utils.checkpoint import load_keypoints, save_keypoints

        tag = "_big" if args.big_caps else ""
        cache = f"/tmp/scene_kp_cache/{args.scene}_ds{args.downscale}{tag}"
        os.makedirs(cache, exist_ok=True)
        kps = []
        todo = len(imgs) if args.detect_only < 0 else args.detect_only
        for i, im in enumerate(imgs[:todo]):
            path = f"{cache}/kp_{i:02d}.npz"
            if os.path.exists(path):
                kps.append(load_keypoints(path))
                continue
            t0 = time.time()
            kp = detect_and_describe(im, cfg)
            save_keypoints(path, kp)
            kps.append(kp)
            print(f"detect {i}: {time.time() - t0:.1f}s", flush=True)
        if args.detect_only >= 0:
            print(f"cached {len(kps)} detections; exiting (detect-only)")
            return

    t0 = time.time()
    if mode == "cylindrical":
        from sift_tpu.models.cylindrical import stitch_scene_cylindrical

        pano = stitch_scene_cylindrical(
            imgs, graph, cfg=cfg, seam_aware=not args.no_seam
        )
    else:
        from sift_tpu.models.stitch import stitch_scene

        from sift_tpu.models import stitch as _st

        if args.big_caps:
            # Full-res scenes: allow multiband on the whole clamped canvas.
            _orig = _st.composite
            _st.composite = lambda im, h, **kw: _orig(
                im, h, **{**kw, "max_multiband_pixels": 80_000_000}
            )
        if args.cache and kps is not None:
            # Resumable solve: cache each BFS-tree edge homography so big
            # scenes can chunk across timeout-bounded runs.
            from sift_tpu.models.stitch import (
                compose_scene, solve_edge_homographies,
            )

            parents = graph.bfs_parents()
            tree = [(i, p) for i, p in parents.items()
                    if i != graph.center_index]
            h_edge = {}
            for e in tree:
                hp = f"{cache}/h_{e[0]:02d}_{e[1]:02d}.npy"
                if os.path.exists(hp):
                    h_edge[e] = np.load(hp)
                    continue
                te = time.time()
                h_edge.update(solve_edge_homographies(
                    kps, graph, cfg, edge_subset=[e]))
                np.save(hp, h_edge[e])
                print(f"edge {e}: {time.time() - te:.1f}s", flush=True)
            pano = compose_scene(imgs, graph, h_edge,
                                 seam_aware=not args.no_seam)
        else:
            pano = stitch_scene(imgs, graph, cfg=cfg,
                                seam_aware=not args.no_seam, kps=kps)
    print(f"stitched {len(imgs)} images -> {pano.shape} "
          f"in {time.time() - t0:.1f}s")

    # Commit-friendly size.
    h, w = pano.shape[:2]
    stride = max(1, int(np.ceil(max(h, w) / 1600)))
    pano = pano[::stride, ::stride]

    out = args.out or f"artifacts/{args.scene}_panorama.png"
    save_image(out, pano)
    print(f"wrote {out} ({pano.shape[1]}x{pano.shape[0]})")


if __name__ == "__main__":
    main()
