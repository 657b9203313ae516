"""Pallas twin-block relayout == XLA BlockRows construction (bit-exact).

The kernel is pure data movement; these interpret-mode tests pin the row
ordering contract (row r block b -> output row r * nb + b, zero-padded past
W) against the XLA construction in ops/gather.py for awkward widths, and
the batched folding used by the production path (sift._batch_multi_rows).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sift_tpu.ops.gather import build_block_rows, build_multi_rows
from sift_tpu.ops.pallas_relayout import twin_rows_2d


@pytest.mark.parametrize(
    "s,h,w,blk",
    [(5, 60, 80, 64), (6, 33, 127, 128), (2, 9, 129, 128), (3, 8, 1280, 64)],
)
def test_twin_rows_matches_xla(s, h, w, blk):
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.uniform(size=(s, h, w)).astype(np.float32))
    ref = build_block_rows(vol, blk)
    got = twin_rows_2d(vol.reshape(s * h, w), blk, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref.rows))


def test_batched_multi_rows_matches_vmap():
    import jax

    from sift_tpu.models.sift import _batch_multi_rows

    rng = np.random.default_rng(1)
    vols_b = [
        jnp.asarray(rng.uniform(size=(3, 5, 24, 40)).astype(np.float32)),
        jnp.asarray(rng.uniform(size=(3, 5, 12, 20)).astype(np.float32)),
    ]
    ref = jax.vmap(lambda a, b: build_multi_rows([a, b], blk=16))(*vols_b)
    got = _batch_multi_rows(vols_b, blk=16)
    np.testing.assert_array_equal(np.asarray(got.rows), np.asarray(ref.rows))
    assert got.shapes == ref.shapes
    assert got.nbs == ref.nbs
    assert got.bases == ref.bases


def test_wide_patch_two_block_gather():
    """gather_patches_multi with patch > blk+1 (the blk=64 production path's
    wide descriptor chunks) must equal the single-block blk=128 gather."""
    rng = np.random.default_rng(2)
    vols = [
        jnp.asarray(rng.uniform(size=(5, 40, 70)).astype(np.float32)),
        jnp.asarray(rng.uniform(size=(5, 20, 35)).astype(np.float32)),
    ]
    from sift_tpu.ops.gather import gather_patches_multi

    n = 64
    oct_id = jnp.asarray(rng.integers(0, 2, size=(n,)).astype(np.int32))
    layer = jnp.asarray(rng.integers(0, 5, size=(n,)).astype(np.int32))
    ys0 = jnp.asarray(rng.integers(-12, 45, size=(n,)).astype(np.int32))
    xs0 = jnp.asarray(rng.integers(-12, 75, size=(n,)).astype(np.int32))
    patch = 33
    ref = gather_patches_multi(
        build_multi_rows(vols, blk=128), oct_id, layer, ys0, xs0, patch
    )
    got = gather_patches_multi(
        build_multi_rows(vols, blk=16), oct_id, layer, ys0, xs0, patch
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
