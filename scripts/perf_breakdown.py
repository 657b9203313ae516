"""Per-stage performance breakdown of the batched SIFT pipeline on the real chip.

Times every stage of detect_and_describe_batch (the bench.py hot path) plus the
XLA-vs-Pallas head-to-heads for the matcher and the pyramid blur, and emits a
markdown table for PERF.md.

Usage: python scripts/perf_breakdown.py [--batch 8] [--reps 30] [--out PERF.md]

Methodology notes:
- block_until_ready does NOT fence device completion on the axon tunnel (it
  can return at dispatch time); the only reliable barrier is a device->host
  read.  Each stage is timed as K enqueued calls ended by one tiny D2H fetch
  of the last result (programs execute in issue order, so the fetch proves
  all K finished); the amortized per-call time is reported.
- One D2H-fenced warmup per program so no queued work leaks into timing.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fence(out):
    """D2H a tiny piece of one leaf: the only real completion barrier here."""
    import jax
    import numpy as np

    leaf = jax.tree.leaves(out)[0]
    # Scalar-slice first so only 4-8 bytes cross the tunnel, not the array.
    return np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, reps, k=8):
    _fence(fn())  # warmup/compile, fenced
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn()
        _fence(out)
        ts.append((time.perf_counter() - t0) / k)
    return statistics.median(ts), min(ts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--bench-caps", action="store_true",
        help="use bench.py's workload-tuned capacities (6144/1536/2048) "
        "instead of the SiftConfig defaults, to profile the headline path",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    os.makedirs("/root/.cache/jax_tpu_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sift_tpu import SiftConfig, match_descriptors
    from sift_tpu.models import sift as S
    from sift_tpu.utils.io import load_image

    cave = "/root/reference/stitching/collection/Dataset/CAVE-01_atrium"
    img1 = load_image(f"{cave}/00.jpg")
    img2 = load_image(f"{cave}/01.jpg")

    cfg = SiftConfig()
    if args.bench_caps:
        cfg = SiftConfig(extrema_cap=6144, kp_cap=1536, ori_cap=2048)
    B = args.batch
    imgs = jnp.asarray(np.stack([img1, img2] * (B // 2)).astype(np.float32))
    h, w = imgs.shape[1], imgs.shape[2]
    scale = 2 if cfg.double_image_size else 1
    octaves = cfg.octaves_count(w * scale, h * scale)

    rows = []  # (stage, median_ms, min_ms)

    def add(name, fn):
        med, mn = timeit(fn, args.reps)
        rows.append((name, med * 1e3, mn * 1e3))
        print(f"{name:32s} median {med*1e3:8.3f} ms   min {mn*1e3:8.3f} ms",
              flush=True)
        return fn()

    # --- stage-by-stage (mirrors the fused detect_and_describe_batch) ---
    if S._use_front(cfg):
        mr, dmr, masks, fcounts = add(
            "front-twin (pyramids+mask+twin rows)",
            lambda: S._jit_front_twin_batch(imgs, cfg, octaves),
        )
        kp0, _off0, counts = add(
            "detect+refine (counts, twin DoG)",
            lambda: S._jit_detect_refine_counts_mr(masks, fcounts, dmr, cfg),
        )
        # round-3 path for comparison ("alt" rows, excluded from total)
        gaussians, dogs, masks3, fcounts3 = add(
            "alt front r3 (plain stacks)",
            lambda: S._jit_front_batch(imgs, cfg, octaves),
        )
        add("alt detect+refine r3 (relayouts DoG)",
            lambda: S._jit_detect_refine_counts(dogs, masks3, fcounts3, cfg))
        add("alt gauss MultiRows relayout r3",
            lambda: S._jit_gauss_rows_batch(gaussians))
    else:
        gaussians, dogs = add(
            "pyramids (init+gauss+dog)",
            lambda: S._jit_pyramids_batch(imgs, cfg, octaves),
        )
        kp0, _off0, counts = add(
            "detect+refine (all octaves)",
            lambda: S._jit_detect_refine_batch(dogs, cfg),
        )
        mr = add("gauss MultiRows relayout",
                 lambda: S._jit_gauss_rows_batch(gaussians))
    cand, _n = add(
        "orientation (all octaves)", lambda: S._jit_orient_batch(mr, kp0, cfg)
    )
    allkp = add(
        "dedup (sort+unique) + compact",
        lambda: S._jit_dedup_compact_batch(cand, cfg.ori_cap),
    )
    from sift_tpu.utils import keypoints as kputil

    dedup_r3 = jax.jit(jax.vmap(
        lambda c: kputil.compact(kputil.sort_and_dedup(c), cfg.ori_cap)
    ))
    add("alt dedup r3 (lexsort+gathers)", lambda: dedup_r3(cand))
    desc_all = add(
        "descriptors (all octaves)",
        lambda: S._jit_desc_all_batch(mr, allkp, cfg),
    )
    kp = dataclasses.replace(allkp, desc=desc_all)

    # (The Pallas histogram-kernel head-to-head was retired in round 5 —
    # the band kernels were deleted on PERF.md's sunset schedule.)
    cfg_py = dataclasses.replace(cfg, use_pallas_pyramid=True)
    add("alt pyramids (fused octave kernel)",
        lambda: S._jit_pyramids_batch(imgs, cfg_py, octaves))

    # --- detect+refine sub-stages (where do those ms go?) ---
    from sift_tpu.models.detect import detect_extrema_all, refine_keypoints_all

    @jax.jit
    def extrema_only(dogs):
        return jax.vmap(
            lambda d: detect_extrema_all(
                d, cfg.extremum_threshold(), cfg.extrema_cap, cfg.window_size
            )
        )(dogs)

    oct_id_b, zyx_b, valid_b, _tot = add(
        "alt detect: extrema+compact only", lambda: extrema_only(dogs)
    )

    @jax.jit
    def refine_only(dogs, oct_id, zyx, valid):
        return jax.vmap(
            lambda d, o, z, v: refine_keypoints_all(d, o, z, v, cfg)
        )(dogs, oct_id, zyx, valid)

    add("alt detect: refine only",
        lambda: refine_only(dogs, oct_id_b, zyx_b, valid_b))

    # --- matcher: XLA vs Pallas on the production capacities ---
    matcher_xla = jax.jit(
        jax.vmap(match_descriptors, in_axes=(0, 0, 0, 0, None)),
        static_argnums=(4,),
    )
    d1, v1 = kp.desc[0::2], kp.valid[0::2]
    d2, v2 = kp.desc[1::2], kp.valid[1::2]
    add("match XLA (B/2 pairs, 8192^2)",
        lambda: matcher_xla(d1, v1, d2, v2, cfg.ratio_threshold))

    from sift_tpu.ops.pallas_match import match_descriptors_pallas

    matcher_pl = jax.jit(
        jax.vmap(
            lambda a, va, b, vb: match_descriptors_pallas(
                a, va, b, vb, cfg.ratio_threshold
            )
        )
    )
    add("match Pallas (B/2 pairs, 8192^2)",
        lambda: matcher_pl(d1, v1, d2, v2))

    # --- blur: XLA shifted-add chain vs Pallas VMEM-resident pass ---
    from sift_tpu.config import gaussian_half_kernel
    from sift_tpu.ops.blur import separable_blur
    from sift_tpu.ops.pallas_blur import pallas_separable_blur

    base = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (960, 1280)).astype(np.float32)
    )
    hk = gaussian_half_kernel(1.6)
    blur_xla = jax.jit(lambda x: separable_blur(x, hk))
    blur_pl = jax.jit(lambda x: pallas_separable_blur(x, hk))
    add("blur XLA (960x1280, s=1.6)", lambda: blur_xla(base))
    add("blur Pallas (960x1280, s=1.6)", lambda: blur_pl(base))
    bbase = jnp.broadcast_to(base, (B, 960, 1280))
    blur_xla_b = jax.jit(jax.vmap(lambda x: separable_blur(x, hk)))
    blur_pl_b = jax.jit(jax.vmap(lambda x: pallas_separable_blur(x, hk)))
    add(f"blur XLA batch {B}", lambda: blur_xla_b(bbase))
    add(f"blur Pallas batch {B}", lambda: blur_pl_b(bbase))

    # --- summary ---
    stage_rows = [
        r for r in rows if not r[0].startswith(("match ", "blur ", "alt "))
    ]
    total = sum(r[1] for r in stage_rows)
    print(f"\npipeline stages total (median): {total:.3f} ms "
          f"for batch {B} -> {B/ (total/1e3):.1f} fps equiv (stage-sync)")

    if args.out:
        lines = [
            "# PERF — per-stage breakdown (real TPU v5 lite, axon)",
            "",
            f"Batched pipeline, B={B} frames of 640x480 (CAVE-01 pair x{B//2}), "
            f"{octaves} octaves, capacities extrema/kp/ori = "
            f"{cfg.extrema_cap}/{cfg.kp_cap}/{cfg.ori_cap}.",
            f"reps={args.reps}; times are per-stage with block_until_ready "
            "(stage-synchronous, so the sum overstates the pipelined total).",
            "",
            "| stage | median ms | min ms | % of stage total |",
            "|---|---|---|---|",
        ]
        for name, med, mn in rows:
            pct = (f"{100*med/total:.1f}%"
                   if not name.startswith(("match ", "blur ", "alt "))
                   else "—")
            lines.append(f"| {name} | {med:.3f} | {mn:.3f} | {pct} |")
        lines.append("")
        with open(args.out, "w") as f:
            f.write("\n".join(lines))
        print(f"wrote {args.out}")

    print(json.dumps({"stage_total_ms_median": round(total, 3), "batch": B}))


if __name__ == "__main__":
    main()
