"""Fixed-capacity keypoint buffers (struct-of-arrays) with validity masks.

The reference's ``std::vector<Keypoint>`` (src/sift.hh:15-53) becomes a
pytree of parallel arrays so every stage has static shapes under jit.  Invalid
lanes carry ``valid == False`` and poisoned sort keys.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Keypoints:
    """Struct-of-arrays keypoint set, capacity N.

    Fields mirror the reference Keypoint (src/sift.hh:15-23):
      x, y   : continuous input-image coordinates
      octave : octave index
      layer  : DoG/gaussian layer index within the octave
      size   : keypoint scale
      pori   : principal orientation in [0, 2*pi)
      desc   : uint8[128] descriptor
      valid  : lane mask (TPU-specific)
    """

    x: jnp.ndarray
    y: jnp.ndarray
    octave: jnp.ndarray
    layer: jnp.ndarray
    size: jnp.ndarray
    pori: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.x.shape[-1]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    @staticmethod
    def empty(n: int, dtype=jnp.float32) -> "Keypoints":
        f = jnp.zeros((n,), dtype)
        i = jnp.zeros((n,), jnp.int32)
        return Keypoints(
            x=f, y=f, octave=i, layer=i, size=f, pori=f,
            desc=jnp.zeros((n, 128), jnp.uint8),
            valid=jnp.zeros((n,), bool),
        )

    def to_numpy(self) -> dict[str, np.ndarray]:
        """Host-side dense export: drops invalid lanes."""
        valid = np.asarray(self.valid)
        out = {}
        for name in ("x", "y", "octave", "layer", "size", "pori"):
            out[name] = np.asarray(getattr(self, name))[valid]
        out["desc"] = np.asarray(self.desc)[valid]
        return out


def concatenate(kps: list[Keypoints]) -> Keypoints:
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *kps)


def sort_and_dedup(kp: Keypoints) -> Keypoints:
    """clean_keypoints (src/sift.cpp:20-24): sort + unique.

    Sort key (src/sift.hh:31-41): x asc, y asc, size DESC, pori asc,
    octave DESC.  Equality for dedup ignores octave/layer (src/sift.hh:25-27).
    Invalid lanes sort to the end via +inf x.
    """
    big = jnp.asarray(jnp.inf, kp.x.dtype)
    x = jnp.where(kp.valid, kp.x, big)
    y = jnp.where(kp.valid, kp.y, big)
    size_neg = jnp.where(kp.valid, -kp.size, big)
    pori = jnp.where(kp.valid, kp.pori, big)
    oct_neg = jnp.where(kp.valid, -kp.octave, 2**30)

    # jnp.lexsort: last key is the primary one.
    order = jnp.lexsort((oct_neg, pori, size_neg, y, x))
    kp = jax.tree.map(lambda a: jnp.take(a, order, axis=0), kp)

    same = (
        (kp.x == jnp.roll(kp.x, 1))
        & (kp.y == jnp.roll(kp.y, 1))
        & (kp.size == jnp.roll(kp.size, 1))
        & (kp.pori == jnp.roll(kp.pori, 1))
    )
    same = same.at[0].set(False)
    keep = kp.valid & ~same
    return dataclasses.replace(kp, valid=keep)


def dedup_compact(kp: Keypoints, out_cap: int) -> Keypoints:
    """Fused clean_keypoints + compaction: one payload-carrying sort pass.

    Semantically identical to ``compact(sort_and_dedup(kp), out_cap)`` (same
    sort keys, same stable order, same representative of each duplicate run)
    but built from two ``lax.sort`` calls that carry the keypoint fields as
    payload operands — no per-lane 1D gathers (the scalar-gather slow path
    that dominated the old dedup+compact stage on TPU).  Requires ``kp.desc``
    to be all-zero (both callers dedup before descriptors are computed);
    returns a buffer with fresh zero descriptors.

    Reference: clean_keypoints (src/sift.cpp:20-24), Keypoint order/equality
    (src/sift.hh:25-41).
    """
    big = jnp.asarray(jnp.inf, kp.x.dtype)
    xk = jnp.where(kp.valid, kp.x, big)
    yk = jnp.where(kp.valid, kp.y, big)
    sneg = jnp.where(kp.valid, -kp.size, big)
    pk = jnp.where(kp.valid, kp.pori, big)
    oneg = jnp.where(kp.valid, -kp.octave, 2**30)

    # Sort 1: the reference's 5-key order (x, y, size desc, pori, octave
    # desc); layer/size/valid ride along as payloads.
    xk, yk, sneg, pk, oneg, layer, size, valid = jax.lax.sort(
        (xk, yk, sneg, pk, oneg, kp.layer, kp.size, kp.valid),
        num_keys=5, is_stable=True,
    )
    same = (
        (xk == jnp.roll(xk, 1))
        & (yk == jnp.roll(yk, 1))
        & (sneg == jnp.roll(sneg, 1))
        & (pk == jnp.roll(pk, 1))
    )
    same = same.at[0].set(False)
    keep = valid & ~same

    # Sort 2: stable partition of kept lanes to the front (key = ~keep).
    _, xk, yk, pk, oneg, layer, size, keep = jax.lax.sort(
        (~keep, xk, yk, pk, oneg, layer, size, keep),
        num_keys=1, is_stable=True,
    )
    n = kp.capacity
    sl = (lambda a: a[:out_cap]) if out_cap <= n else (
        lambda a: jnp.concatenate(
            [a, jnp.zeros((out_cap - n,) + a.shape[1:], a.dtype)]
        )
    )
    keep = sl(keep)
    # Sanitize the +inf/sentinel poisons out of invalid lanes so downstream
    # arithmetic (int casts in gather indexing) never sees non-finite values.
    zf = jnp.zeros((), kp.x.dtype)
    return Keypoints(
        x=jnp.where(keep, sl(xk), zf),
        y=jnp.where(keep, sl(yk), zf),
        octave=jnp.where(keep, -sl(oneg), 0).astype(jnp.int32),
        layer=jnp.where(keep, sl(layer), 0),
        size=jnp.where(keep, sl(size), zf),
        pori=jnp.where(keep, sl(pk), zf),
        desc=jnp.zeros((out_cap, 128), jnp.uint8),
        valid=keep,
    )


def compact_indices(valid: jnp.ndarray, out_cap: int):
    """Indices packing valid lanes front-first: (idx, in_range).

    Uses the two-stage row compaction (ops/gather.compact_mask), which avoids
    the TPU scalar-gather slow path that ``jnp.nonzero`` lowers to.
    """
    from sift_tpu.ops.gather import compact_mask

    return compact_mask(valid, out_cap)


def compact(kp: Keypoints, out_cap: int, extra=None):
    """Pack valid lanes to the front of a (possibly smaller) buffer.

    ``extra``: optional pytree of per-lane arrays compacted alongside.

    Built as ONE payload-carrying stable sort on the ``~valid`` key (valid
    lanes keep their original order at the front — identical values to the
    old compact_mask + per-field ``jnp.take`` formulation on every valid
    lane, bit-for-bit, since payloads pass through the sort verbatim).
    Per-field 1D takes were the TPU scalar-gather slow path (~2 ms/sweep in
    both the refine and orientation programs at batch 16); the carried
    iota recovers the take indices for the (row-gather-fast) desc matrix
    and any ``extra`` arrays.  Invalid output lanes hold other lanes'
    (finite) values instead of lane n-1's — every consumer masks by
    ``valid``, which this sets identically.
    """
    n = kp.capacity
    iota = jnp.arange(n, dtype=jnp.int32)
    _, idx, x, y, size, pori, octave, layer, valid = jax.lax.sort(
        (~kp.valid, iota, kp.x, kp.y, kp.size, kp.pori, kp.octave,
         kp.layer, kp.valid),
        num_keys=1, is_stable=True,
    )
    if out_cap <= n:
        sl = lambda a: a[:out_cap]  # noqa: E731
    else:
        sl = lambda a: jnp.concatenate(  # noqa: E731
            [a, jnp.zeros((out_cap - n,) + a.shape[1:], a.dtype)]
        )
    valid = sl(valid)
    idx = sl(idx)
    out = Keypoints(
        x=sl(x), y=sl(y), octave=sl(octave), layer=sl(layer),
        size=sl(size), pori=sl(pori),
        desc=jnp.take(kp.desc, idx, axis=0), valid=valid,
    )
    if extra is None:
        return out
    return out, jax.tree.map(lambda a: jnp.take(a, idx, axis=0), extra)
