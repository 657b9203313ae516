"""Per-op device self-times of the PRODUCTION bench sweep (xprof).

Traces a few fused-bench sweeps on the real chip and prints the top ops by
device self-time from xprof's framework_op_stats — the same methodology
that drove the round-4 wins (see PERF.md profiling note).
"""

from __future__ import annotations

import glob
import json
import os
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

    from sift_tpu import SiftConfig, match_descriptors
    from sift_tpu.models.sift import detect_and_describe_batch
    from sift_tpu.utils.io import load_image

    cave = "/root/reference/stitching/collection/Dataset/CAVE-01_atrium"
    img1 = load_image(f"{cave}/00.jpg")
    img2 = load_image(f"{cave}/01.jpg")
    B = 16
    imgs = jnp.asarray(np.stack([img1, img2] * (B // 2)).astype(np.float32))
    cfg = SiftConfig(extrema_cap=6144, kp_cap=1536, ori_cap=2048)
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
        return np.asarray(x)[0, 0]

    fence(sweep())  # warmup/compile

    trace_dir = "/tmp/sift_trace_opstats"
    import shutil

    shutil.rmtree(trace_dir, ignore_errors=True)
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        acc = sweep()
    fence(acc)
    jax.profiler.stop_trace()
    time.sleep(1)

    import re

    from xprof.convert.raw_to_tool_data import xspace_to_tool_data

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    data, _ = xspace_to_tool_data(
        paths, "framework_op_stats", {"tqx": "out:json"}
    )
    t0 = json.loads(data)[0]
    cols = [c["id"] for c in t0["cols"]]
    stats, groups = [], {}
    for r in t0["rows"]:
        c = dict(zip(cols, [x["v"] for x in r["c"]]))
        if c.get("host_or_device") != "Device":
            continue
        selft = float(c["total_self_time"])  # us, summed over 3 sweeps
        stats.append((selft, c["operation"], int(c["occurrences"]), c["type"]))
        m = re.match(r"jit\(([^)]+)\)", c["operation"])
        g = m.group(1) if m else (
            "IDLE" if c["operation"] == "IDLE" else "OTHER"
        )
        groups[g] = groups.get(g, 0.0) + selft
    tot = sum(s[0] for s in stats)
    print(f"total device self time: {tot / 1e3 / 3:.1f} ms/sweep (3 sweeps)")
    print("--- by program:")
    for g, v in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"{v / 3e3:8.3f} ms  {g}")
    print("--- top ops:")
    stats.sort(reverse=True)
    for selft, name, occ, typ in stats[:30]:
        print(f"{selft / 3e3:9.3f} ms  x{occ:5d} {typ:16s} {name[:100]}")


if __name__ == "__main__":
    main()
