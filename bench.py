"""Headline benchmark: SIFT detect+describe+match throughput at 640x480.

Prints ONE JSON line:
  {"metric": "sift_detect_describe_match_640x480", "value": <fps>,
   "unit": "frames/s/chip", "vs_baseline": <speedup vs C++ reference>}

Baseline (BASELINE.md): the C++ reference runs ~0.0104 frames/s on one CPU
core (77.6 s + 114.8 s detect for the CAVE-01 pair + 61 ms match ->
2 frames / 192.46 s).  vs_baseline = fps / 0.010392.

Timing methodology (important on the axon tunnel): ``block_until_ready``
does NOT reliably fence device completion here — it can return at dispatch
time, which silently turns a throughput bench into a dispatch-rate bench
(round-1 numbers overstated ~4x this way).  The only trustworthy fence is a
device->host read of (a piece of) the result: the TPU executes programs in
issue order, so fetching the last output of a K-sweep enqueue proves all K
sweeps finished.  We therefore time K enqueued sweeps ended by one tiny D2H
fetch and report amortized frames/s; the warmup is fenced the same way so
no queued work leaks into the timed window.
"""

from __future__ import annotations

import json
import os
import statistics
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

    from sift_tpu import SiftConfig, match_descriptors
    from sift_tpu.utils.io import load_image

    cave = "/root/reference/stitching/collection/Dataset/CAVE-01_atrium"
    try:
        img1 = load_image(f"{cave}/00.jpg")
        img2 = load_image(f"{cave}/01.jpg")
    except Exception:
        rng = np.random.default_rng(0)
        img1 = rng.uniform(0, 255, (480, 640, 3)).astype(np.float32)
        img2 = rng.uniform(0, 255, (480, 640, 3)).astype(np.float32)

    from sift_tpu.models.sift import detect_and_describe_batch

    # Workload-tuned capacities: every stage's cost scales with CAPACITY,
    # not keypoint count, so the 640x480 bench runs with caps sized for its
    # measured content (extrema<=5001, refined<=902, oriented<=1068 per
    # frame) plus headroom.  Honesty guard below: the true per-stage counts
    # are asserted against the caps, so clipping would abort the bench, and
    # with no clipping the match sets are identical to default-cap runs.
    cfg = SiftConfig(extrema_cap=6144, kp_cap=1536, ori_cap=2048)
    # (The BENCH_PALLAS opt-in histogram-kernel A/B was retired in round 5
    # on PERF.md's sunset schedule — the band kernels were deleted after
    # two measured generations lost to the XLA one-hot + MXU path.)

    # Batched mode: B frames per sweep (B/2 pairs), matcher vmapped over
    # pairs.  Every frame runs the full detect+describe+match pipeline.
    B = int(os.environ.get("BENCH_BATCH", "16"))
    imgs = jnp.asarray(
        np.stack([img1, img2] * (B // 2)).astype(np.float32)
    )
    matcher = jax.jit(
        jax.vmap(match_descriptors, in_axes=(0, 0, 0, 0, None)),
        static_argnums=(4,),
    )

    def sweep():
        kp = detect_and_describe_batch(imgs, cfg)
        _, accept, _, _ = matcher(
            kp.desc[0::2], kp.valid[0::2], kp.desc[1::2], kp.valid[1::2],
            cfg.ratio_threshold,
        )
        return accept

    def fence(x):
        # The only reliable completion barrier on this platform: D2H.
        return np.asarray(x)[0, 0]

    # Warmup/compile, fenced so no queued work leaks into the timed window.
    fence(sweep())

    # Capacity honesty check: no stage may have clipped real detections.
    _, counts = detect_and_describe_batch(imgs, cfg, return_counts=True)
    from sift_tpu.models.detect import refine_cascade_caps

    from sift_tpu.models.sift import ORI_CAND_SLOTS

    for name, cap in (("extrema", cfg.extrema_cap), ("refined", cfg.kp_cap),
                      ("oriented", cfg.ori_cap),
                      ("ori_slots_max", ORI_CAND_SLOTS)):
        mx = int(np.asarray(counts[name]).max())
        assert mx <= cap, f"{name} overflow: {mx} > cap {cap}"
    ract = np.asarray(counts["refine_active"])  # (B, phases)
    for p, (cap_p, _steps) in enumerate(
        refine_cascade_caps(cfg, cfg.extrema_cap)
    ):
        mx = int(ract[..., p].max())
        assert mx <= cap_p, f"refine_active[{p}] overflow: {mx} > cap {cap_p}"

    # Amortized timing: enqueue K sweeps, fence once on the last result.
    # Repeat R times; report median and best (min) run.
    K, R = 10, 5
    per_sweep = []
    for _ in range(R):
        t0 = time.perf_counter()
        for _ in range(K):
            acc = sweep()
        fence(acc)
        per_sweep.append((time.perf_counter() - t0) / K)
    med_fps = B / statistics.median(per_sweep)
    best_fps = B / min(per_sweep)

    # Streaming mode: JPEG decode (threaded C++ loader) + H2D INSIDE the
    # timed window — the end-to-end disk->matches figure the device-resident
    # number omits.  Decoder threads run ahead of the device, so with enough
    # threads the published gap is pipeline fill, not decode rate.
    stream = {}
    if os.environ.get("BENCH_STREAM", "1") != "0":
        try:
            from sift_tpu.utils import native

            if not native.available():
                raise RuntimeError("native loader not built (make native)")
            import pathlib

            scene = pathlib.Path(cave)
            paths = sorted(str(p) for p in scene.glob("*.jpg"))
            if not paths:
                raise RuntimeError("no scene files")
            # The streaming sweep covers EVERY scene frame, some busier than
            # the tuned pair (measured max 6486 extrema on CAVE-01), so it
            # runs with scene-sized capacities; the honesty scan below
            # asserts them against the whole corpus.
            import dataclasses as _dc

            cfg_s = _dc.replace(
                cfg, extrema_cap=8192, kp_cap=2048, ori_cap=3072
            )

            def run_stream(k_sweeps):
                seq = [
                    paths[(s * B + i) % len(paths)]
                    for s in range(k_sweeps) for i in range(B)
                ]
                loader = native.ImageLoader(seq, n_threads=8)
                out = None
                for _ in range(k_sweeps):
                    frames = [next(loader) for _ in range(B)]
                    # Ship u8 and convert on device: JPEG pixels are
                    # integral, and the axon tunnel's H2D bandwidth is this
                    # mode's MEASURED bottleneck (scripts/probe_h2d.py:
                    # 44.0 MB/s raw device_put ceiling -> 47.8 fps max at
                    # B=16; the loop runs at ~100% of that, with decode,
                    # pack and compute fully overlapped — see PERF.md).
                    dev = jnp.asarray(np.stack(frames).astype(np.uint8))
                    kp_s = detect_and_describe_batch(dev, cfg_s)
                    _, out, _, _ = matcher(
                        kp_s.desc[0::2], kp_s.valid[0::2],
                        kp_s.desc[1::2], kp_s.valid[1::2],
                        cfg.ratio_threshold,
                    )
                loader.close()
                return out

            # Honesty: the whole scene must fit the bench capacities (the
            # streaming sweep covers every frame, not just the tuned pair).
            all_imgs = [np.asarray(jnpf) for jnpf in
                        native.ImageLoader(paths, n_threads=8)]
            while len(all_imgs) % B:  # pad so the scan covers every frame
                all_imgs.append(all_imgs[0])
            for lo in range(0, len(all_imgs), B):
                _, cts = detect_and_describe_batch(
                    jnp.asarray(np.stack(all_imgs[lo:lo + B])), cfg_s,
                    return_counts=True,
                )
                for name, cap in (("extrema", cfg_s.extrema_cap),
                                  ("refined", cfg_s.kp_cap),
                                  ("oriented", cfg_s.ori_cap),
                                  ("ori_slots_max", ORI_CAND_SLOTS)):
                    mx = int(np.asarray(cts[name]).max())
                    assert mx <= cap, (
                        f"stream {name} overflow: {mx} > {cap} "
                        f"(frames {lo}..{lo+B})"
                    )
            del all_imgs
            fence(run_stream(1))  # warmup/compile the scene-cap programs
            ks, rs = 6, 3
            per = []
            for _ in range(rs):
                t0 = time.perf_counter()
                out = run_stream(ks)
                fence(out)
                per.append((time.perf_counter() - t0) / ks)
            # Raw tunnel H2D ceiling, measured in-run: stream_fps is
            # transfer-bound (PERF.md), so record the ceiling beside it.
            bufs = [rng.integers(0, 255, (B, 480, 640, 3), dtype=np.uint8)
                    for rng in [np.random.default_rng(1)] for _ in range(4)]
            _ = np.asarray(jax.device_put(bufs[0])[0, 0, 0])
            h2d = []
            for _ in range(3):
                t0 = time.perf_counter()
                last = None
                for i in range(4):
                    last = jax.device_put(bufs[i])
                _ = np.asarray(last[0, 0, 0])
                h2d.append((time.perf_counter() - t0) / 4)
            h2d_s = statistics.median(h2d)
            stream = {
                "stream_fps": round(B / statistics.median(per), 3),
                "stream_method": f"JPEG decode + H2D in-window, {ks} sweeps "
                                 f"x {rs}, threaded native loader",
                "stream_h2d_ceiling_fps": round(B / h2d_s, 3),
                "stream_h2d_MBps": round(
                    B * 480 * 640 * 3 / h2d_s / 1e6, 1
                ),
            }
        except Exception as e:  # pragma: no cover - report, don't fail bench
            stream = {"stream_error": str(e)[:200]}

    print(
        json.dumps(
            {
                "metric": "sift_detect_describe_match_640x480",
                "value": round(med_fps, 3),
                "unit": "frames/s/chip",
                "vs_baseline": round(med_fps / BASELINE_FPS, 1),
                "best": round(best_fps, 3),
                "batch": B,
                "method": f"amortized over {K} enqueued sweeps, D2H-fenced, "
                          f"median of {R}",
                **stream,
            }
        )
    )


if __name__ == "__main__":
    main()
