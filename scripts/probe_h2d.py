"""Measure the axon tunnel's raw H2D bandwidth + streaming-loop breakdown.

Answers VERDICT round-4 weak #2: is the 45 fps streaming number
tunnel-H2D-bound (as bench.py asserted without measurement) or is there
pipeline headroom?  Runs on the real chip.

Legs:
  1. raw H2D: device_put of B x 480 x 640 x 3 u8 batches, D2H-fenced ->
     MB/s through the tunnel (the physical ceiling for streaming input).
  2. decode: native threaded loader alone (host-side JPEG rate).
  3. host pack: np.stack + astype(u8) of B decoded f32 frames.
  4. streaming loop phases: per-sweep time of load / pack / H2D-put /
     enqueue, with the compute fenced once at the end (same methodology
     as bench.py).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    os.makedirs("/root/.cache/jax_tpu_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B = 16
    h, w = 480, 640
    nbytes = B * h * w * 3
    rng = np.random.default_rng(0)

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # --- leg 1: raw H2D bandwidth -------------------------------------
    # Distinct source buffers each rep (no dedup); fence with a 1-element
    # D2H read of the LAST transferred array (transfers complete in order).
    bufs = [rng.integers(0, 255, (B, h, w, 3), dtype=np.uint8)
            for _ in range(8)]
    # warmup
    a = jax.device_put(bufs[0], dev)
    _ = np.asarray(a[0, 0, 0])
    for reps in (8,):
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            last = None
            for i in range(reps):
                last = jax.device_put(bufs[i % len(bufs)], dev)
            _ = np.asarray(last[0, 0, 0])
            times.append((time.perf_counter() - t0) / reps)
        med = statistics.median(times)
        print(f"H2D raw: {nbytes / med / 1e6:.1f} MB/s "
              f"({med * 1e3:.1f} ms per {nbytes / 1e6:.1f} MB batch, "
              f"min {nbytes / max(times) / 1e6:.1f}, "
              f"max {nbytes / min(times) / 1e6:.1f} MB/s)", flush=True)

    # Same, f32 (4x bytes) — sanity that bandwidth, not per-op overhead,
    # dominates.
    buf32 = [b.astype(np.float32) for b in bufs[:4]]
    a = jax.device_put(buf32[0], dev)
    _ = np.asarray(a[0, 0, 0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        last = None
        for i in range(4):
            last = jax.device_put(buf32[i % len(buf32)], dev)
        _ = np.asarray(last[0, 0, 0])
        times.append((time.perf_counter() - t0) / 4)
    med = statistics.median(times)
    print(f"H2D raw f32: {4 * nbytes / med / 1e6:.1f} MB/s "
          f"({med * 1e3:.1f} ms per {4 * nbytes / 1e6:.1f} MB)", flush=True)

    # --- leg 2: decode rate -------------------------------------------
    from sift_tpu.utils import native

    cave = "/root/reference/stitching/collection/Dataset/CAVE-01_atrium"
    import pathlib

    paths = sorted(str(p) for p in pathlib.Path(cave).glob("*.jpg"))
    seq = [paths[i % len(paths)] for i in range(96)]
    for nt in (8, 16):
        t0 = time.perf_counter()
        loader = native.ImageLoader(seq, n_threads=nt)
        frames = [next(loader) for _ in range(len(seq))]
        loader.close()
        dt = time.perf_counter() - t0
        print(f"decode: {len(seq) / dt:.1f} frames/s ({nt} threads)",
              flush=True)

    # --- leg 3: host pack ---------------------------------------------
    fb = frames[:B]
    t0 = time.perf_counter()
    for _ in range(10):
        packed = np.stack(fb).astype(np.uint8)
    dt = (time.perf_counter() - t0) / 10
    print(f"pack (stack f32 + astype u8): {dt * 1e3:.1f} ms per batch",
          flush=True)

    # --- leg 4: streaming loop phase breakdown ------------------------
    from sift_tpu import SiftConfig, match_descriptors
    from sift_tpu.models.sift import detect_and_describe_batch
    import dataclasses as _dc

    cfg = SiftConfig(extrema_cap=8192, kp_cap=2048, ori_cap=3072)
    matcher = jax.jit(
        jax.vmap(match_descriptors, in_axes=(0, 0, 0, 0, None)),
        static_argnums=(4,),
    )

    def fence(x):
        return np.asarray(x)[0, 0]

    # warmup/compile
    dev_imgs = jnp.asarray(np.stack(frames[:B]).astype(np.uint8))
    kp = detect_and_describe_batch(dev_imgs, cfg)
    _, out, _, _ = matcher(kp.desc[0::2], kp.valid[0::2], kp.desc[1::2],
                           kp.valid[1::2], cfg.ratio_threshold)
    fence(out)

    ks = 6
    for rep in range(3):
        seq = [paths[(s * B + i) % len(paths)]
               for s in range(ks) for i in range(B)]
        loader = native.ImageLoader(seq, n_threads=8)
        t_load = t_pack = t_put = t_enq = 0.0
        t0 = time.perf_counter()
        out = None
        for _ in range(ks):
            t = time.perf_counter()
            fr = [next(loader) for _ in range(B)]
            t_load += time.perf_counter() - t
            t = time.perf_counter()
            packed = np.stack(fr).astype(np.uint8)
            t_pack += time.perf_counter() - t
            t = time.perf_counter()
            di = jax.device_put(packed, dev)
            t_put += time.perf_counter() - t
            t = time.perf_counter()
            kp = detect_and_describe_batch(di, cfg)
            _, out, _, _ = matcher(kp.desc[0::2], kp.valid[0::2],
                                   kp.desc[1::2], kp.valid[1::2],
                                   cfg.ratio_threshold)
            t_enq += time.perf_counter() - t
        fence(out)
        total = time.perf_counter() - t0
        loader.close()
        print(f"stream rep{rep}: {B * ks / total:.1f} fps | per-sweep ms: "
              f"load {t_load / ks * 1e3:.1f} pack {t_pack / ks * 1e3:.1f} "
              f"put {t_put / ks * 1e3:.1f} enqueue {t_enq / ks * 1e3:.1f} "
              f"total {total / ks * 1e3:.1f}", flush=True)


if __name__ == "__main__":
    main()
