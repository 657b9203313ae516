"""Scaling-efficiency harness: frames/s at 1, 2, ..., N devices.

Measures data-parallel throughput of the full detect+describe pipeline over
a ``data`` mesh axis: each device processes its shard of an image batch
(per-device batch held constant = weak scaling), so efficiency(N) =
fps(N) / (N * fps(1)).

On a real pod slice (multiple chips over ICI) this is the
"frames/s at 1 chip / 1 host / N hosts" measurement from BASELINE.json; run
under `jax.distributed.initialize` for multi-host.  On a single-chip dev box
it can run against simulated CPU devices
(``--simulate N`` sets XLA_FLAGS=--xla_force_host_platform_device_count=N),
which validates the sharded program and collective layout but shares one
CPU's FLOPs, so simulated efficiency reflects dispatch overhead, not
hardware scaling.

Usage:
  python scripts/bench_scaling.py [--simulate 8] [--per-device-batch 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--simulate", type=int, default=0,
                    help="simulate N CPU devices (validation, not perf)")
    ap.add_argument("--per-device-batch", type=int, default=2)
    ap.add_argument("--size", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    if args.simulate:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.simulate}"
        ).strip()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    if args.simulate:
        jax.config.update("jax_platforms", "cpu")
    else:
        os.makedirs("/root/.cache/jax_tpu_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sift_tpu import SiftConfig
    from sift_tpu.models.sift import detect_fn
    from sift_tpu.parallel.mesh import make_mesh

    h, w = args.size
    cfg = SiftConfig(
        dtype=jnp.float32,
        extrema_cap=2048 if max(h, w) > 256 else 256,
        kp_cap=1024 if max(h, w) > 256 else 128,
        ori_cap=2048 if max(h, w) > 256 else 512,
    )
    octaves = cfg.octaves_count(w * 2, h * 2)
    rng = np.random.default_rng(0)

    n_dev = len(jax.devices())
    results = []
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev]
    for n in sizes:
        mesh = make_mesh(data=n, kp=1, devices=jax.devices()[:n])
        batch = n * args.per_device_batch
        imgs = rng.uniform(0, 255, (batch, h, w, 3)).astype(np.float32)
        sharded = jax.device_put(
            jnp.asarray(imgs), NamedSharding(mesh, P("data"))
        )

        fn = jax.jit(jax.vmap(lambda im: detect_fn(im, cfg, octaves)))
        with mesh:
            out = fn(sharded)
            jax.block_until_ready(out)
            times = []
            for _ in range(args.iters):
                t0 = time.time()
                jax.block_until_ready(fn(sharded))
                times.append(time.time() - t0)
        fps = batch / min(times)
        results.append((n, fps))

    base = results[0][1]
    table = [
        {
            "devices": n,
            "frames_per_s": round(fps, 2),
            "efficiency": round(fps / (n * base), 3),
        }
        for n, fps in results
    ]
    print(json.dumps({"mode": "simulated-cpu" if args.simulate else "tpu",
                      "scaling": table}))


if __name__ == "__main__":
    main()
