"""XLA vs Pallas matcher A/B across descriptor-set sizes on the real chip.

The XLA matcher materializes (or lets XLA fuse away) the (N, M) distance
matrix; the Pallas kernel keeps a running top-2 in VMEM and never touches
HBM with it.  This sweep finds where (if anywhere) each wins.

Usage: python scripts/bench_match_ab.py [--reps 20]
Prints one JSON line per (size, path) and a final table.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[2048, 8192, 16384, 32768])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    os.makedirs("/root/.cache/jax_tpu_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sift_tpu.models.match import match_descriptors
    from sift_tpu.ops.pallas_match import match_descriptors_pallas

    rng = np.random.default_rng(0)

    def fence(out):
        # block_until_ready does not fence on the axon tunnel; a D2H read of
        # the last result does (in-order execution).
        leaf = jax.tree.leaves(out)[0]
        return np.asarray(leaf[(0,) * leaf.ndim])

    def timeit(fn, *xs, k=8):
        fence(fn(*xs))  # fenced warmup
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(k):
                out = fn(*xs)
            fence(out)
            ts.append((time.perf_counter() - t0) / k)
        return statistics.median(ts), min(ts)

    fx = jax.jit(lambda a, va, b, vb: match_descriptors(a, va, b, vb, 0.75))
    fp = jax.jit(lambda a, va, b, vb: match_descriptors_pallas(a, va, b, vb, 0.75))

    results = []
    for n in args.sizes:
        d1 = jnp.asarray(rng.integers(0, 180, (n, 128), dtype=np.uint8))
        d2 = jnp.asarray(rng.integers(0, 180, (n, 128), dtype=np.uint8))
        v1 = jnp.ones((n,), bool)
        v2 = jnp.ones((n,), bool)
        flops = 2.0 * n * n * 128
        for name, fn in (("xla", fx), ("pallas", fp)):
            try:
                med, mn = timeit(fn, d1, v1, d2, v2)
            except Exception as e:  # OOM at the top sizes is a datapoint too
                results.append(dict(n=n, path=name, error=str(e)[:120]))
                print(json.dumps(results[-1]), flush=True)
                continue
            results.append(dict(
                n=n, path=name, median_ms=round(med * 1e3, 3),
                min_ms=round(mn * 1e3, 3),
                tflops_at_min=round(flops / mn / 1e12, 1),
            ))
            print(json.dumps(results[-1]), flush=True)

    # agreement check at one size (after timing: D2H OK now)
    n = 4096
    d1 = jnp.asarray(rng.integers(0, 180, (n, 128), dtype=np.uint8))
    d2 = jnp.asarray(rng.integers(0, 180, (n, 128), dtype=np.uint8))
    v = jnp.ones((n,), bool)
    ix, ax_, bx, sx = fx(d1, v, d2, v)
    ip, ap_, bp, sp = fp(d1, v, d2, v)
    agree = bool(
        (np.asarray(ix) == np.asarray(ip)).all()
        and (np.asarray(ax_) == np.asarray(ap_)).all()
        and (np.asarray(bx) == np.asarray(bp)).all()
    )
    print(json.dumps(dict(agreement_4096=agree)))


if __name__ == "__main__":
    main()
