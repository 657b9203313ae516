"""Distributed pipeline stages: data-parallel detection, sharded matching.

Design (SURVEY.md section 2.7): the reference's two sequential detect calls
(src/main.cpp:14-15) become a vmapped batch sharded over the ``data`` mesh
axis; the O(N*M) brute-force matcher (src/sift.cpp:783-815) shards the
B-side descriptors over the ``kp`` axis — each device computes a local top-2
via the exact-int MXU kernel, then the global top-2 merges with an
``all_gather`` over ICI.  Tie-breaking stays bit-faithful: the merge compares
(distance, global index) lexicographically, which equals the reference's
first-index-wins scan order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from sift_tpu.config import SiftConfig
from sift_tpu.models.match import _HUGE_D2, pairwise_sq_dists
from sift_tpu.models.sift import detect_fn


def batched_detect(images: jnp.ndarray, cfg: SiftConfig, octaves: int, mesh: Mesh):
    """Detect+describe a (B, H, W, C) batch, B sharded over the data axis.

    Returns a Keypoints pytree with leading batch dim, sharded over 'data'.
    """
    sharding = NamedSharding(mesh, P("data"))
    images = jax.device_put(images, sharding)
    fn = jax.jit(jax.vmap(lambda im: detect_fn(im, cfg, octaves)))
    return fn(images)


def _local_top2(d2: jnp.ndarray):
    """Per-row (best, second, best_idx) of an int32 distance block."""
    m = d2.shape[1]
    best_idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
    best = jnp.take_along_axis(d2, best_idx[:, None], axis=1)[:, 0]
    cols = jnp.arange(m, dtype=jnp.int32)
    second = jnp.min(
        jnp.where(cols[None, :] == best_idx[:, None], _HUGE_D2, d2), axis=1
    )
    return best, second, best_idx


def sharded_match(
    desc1: jnp.ndarray,
    valid1: jnp.ndarray,
    desc2: jnp.ndarray,
    valid2: jnp.ndarray,
    mesh: Mesh,
    ratio_threshold: float = 0.75,
):
    """Lowe-ratio matching with the B side sharded over the 'kp' mesh axis.

    Exact same results as models.match.match_descriptors (see tests).
    """
    nkp = mesh.shape["kp"]
    m = desc2.shape[0]
    assert m % nkp == 0, "B-side capacity must divide the kp axis"

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None), P(None), P("kp", None), P("kp")),
        out_specs=(P(None), P(None), P(None)),
        check_vma=False,
    )
    def local(d1, v1, d2_shard, v2_shard):
        d2 = pairwise_sq_dists(d1, d2_shard)
        d2 = jnp.where(v2_shard[None, :], d2, _HUGE_D2)
        best, second, bidx = _local_top2(d2)
        shard = jax.lax.axis_index("kp")
        # Global index = local column + shard offset.  The offset is the
        # B-side SHARD WIDTH (d2.shape[1] = m/nkp), not d2_shard.shape[1]
        # (the 128-wide descriptor dim) — the two coincide only when
        # m/nkp == 128, which is why narrow-capacity tests can't catch a
        # mix-up here (tests/test_batch.py now uses a non-128 shard width).
        gidx = bidx + shard * d2.shape[1]

        # Merge across shards: all_gather the per-shard top-2 candidates.
        bests = jax.lax.all_gather(best, "kp")      # (nkp, N)
        seconds = jax.lax.all_gather(second, "kp")  # (nkp, N)
        gidxs = jax.lax.all_gather(gidx, "kp")      # (nkp, N)

        # Global best: argmin over shards picks the lowest shard id on ties,
        # and shards cover ascending global index ranges, so this reproduces
        # the reference's first-index-wins scan order exactly.
        win = jnp.argmin(bests, axis=0)
        n = best.shape[0]
        rows = jnp.arange(n)
        g_best = bests[win, rows]
        g_bidx = gidxs[win, rows]
        # Global second: min over remaining candidates (other shards' bests
        # still count — duplicates of the best distance in other shards are
        # valid second-best values, matching src/sift.cpp:803).
        masked_bests = jnp.where(
            jnp.arange(bests.shape[0])[:, None] == win[None, :], _HUGE_D2, bests
        )
        g_second = jnp.minimum(jnp.min(masked_bests, axis=0), jnp.min(seconds, axis=0))
        return g_best, g_second, g_bidx

    best, second, best_idx = local(desc1, valid1, desc2, valid2)

    from fractions import Fraction

    frac = Fraction(ratio_threshold * ratio_threshold).limit_denominator(64)
    if abs(float(frac) - ratio_threshold * ratio_threshold) < 1e-12:
        p, q = frac.numerator, frac.denominator
        accept = (q * best) < (p * second)
    else:
        r2 = jnp.float32(ratio_threshold * ratio_threshold)
        accept = best.astype(jnp.float32) < r2 * second.astype(jnp.float32)
    accept = accept & valid1 & (best < _HUGE_D2)
    return best_idx, accept, best, second
