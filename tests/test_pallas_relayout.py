"""Pallas twin-block relayout == XLA BlockRows construction (bit-exact).

The kernel is pure data movement; these interpret-mode tests pin the row
ordering contract (row r block b -> output row r * nb + b, zero-padded past
W) against the XLA construction in ops/gather.py for awkward widths, and
the batched folding used by the production path (sift._batch_multi_rows).
"""

import jax
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


def test_strip_interleaved_rows_content():
    """Every defined row of the strip-interleaved buffer equals the XLA
    twin row for the same (image, octave, flat row, block)."""
    from sift_tpu.ops.pallas_relayout import twin_rows_strips

    rng = np.random.default_rng(1)
    vols_b = [
        jnp.asarray(rng.uniform(size=(3, 5, 24, 40)).astype(np.float32)),
        jnp.asarray(rng.uniform(size=(3, 5, 12, 20)).astype(np.float32)),
    ]
    got = twin_rows_strips(vols_b, blk=16, interpret=True)
    rows = np.asarray(got.rows)  # (B, RT, 2 * blk)
    for o, v in enumerate(vols_b):
        b_, s, h, w = v.shape
        nb, ls = got.nbs[o], got.shp[o]
        st = 1 << ls
        vp = np.pad(np.asarray(v).reshape(b_, s * h, w),
                    ((0, 0), (0, 0), (0, (nb + 1) * 16 - w)))
        for bi in range(b_):
            for r in range(s * h):
                for blkk in range(nb):
                    ridx = got.bases[o] + (
                        (((r >> ls) * nb + blkk) << ls) + (r & (st - 1))
                    )
                    np.testing.assert_array_equal(
                        rows[bi, ridx],
                        vp[bi, r, blkk * 16 : (blkk + 2) * 16],
                    )


def test_batched_multi_rows_gathers_match_xla():
    """Production _batch_multi_rows (strip-interleaved, shp set) must gather
    identically to the vmapped XLA MultiRows through both gather kinds and
    the merge_batch flattening, including the wide two-block patch path."""
    from sift_tpu.models.sift import _batch_multi_rows
    from sift_tpu.ops.gather import (
        gather_cubes_multi,
        gather_patches_multi,
        merge_batch_multi_rows,
    )

    rng = np.random.default_rng(1)
    vols_b = [
        jnp.asarray(rng.uniform(size=(3, 5, 24, 80)).astype(np.float32)),
        jnp.asarray(rng.uniform(size=(3, 5, 12, 40)).astype(np.float32)),
    ]
    ref = jax.vmap(lambda a, b: build_multi_rows([a, b], blk=16))(*vols_b)
    got = _batch_multi_rows(vols_b, blk=16)
    assert got.shapes == tuple(v.shape[1:] for v in vols_b)
    assert got.nbs == ref.nbs

    n = 96
    bsz = 3
    img = rng.integers(0, bsz, size=(n,)).astype(np.int32)
    oct_id = rng.integers(0, 2, size=(n,)).astype(np.int32)
    hs = np.where(oct_id == 0, 24, 12)
    ws = np.where(oct_id == 0, 80, 40)
    z = rng.integers(1, 4, size=(n,)).astype(np.int32)
    y = (rng.integers(1, 1000, size=(n,)) % (hs - 2) + 1).astype(np.int32)
    x = (rng.integers(1, 1000, size=(n,)) % (ws - 2) + 1).astype(np.int32)
    vol_sel = jnp.asarray(img * 2 + oct_id)
    zyx = jnp.stack(
        [jnp.asarray(z), jnp.asarray(y), jnp.asarray(x)], axis=1
    )
    mref = merge_batch_multi_rows(ref, bsz)
    mgot = merge_batch_multi_rows(got, bsz)
    np.testing.assert_array_equal(
        np.asarray(gather_cubes_multi(mgot, vol_sel, zyx)),
        np.asarray(gather_cubes_multi(mref, vol_sel, zyx)),
    )
    layer = jnp.asarray(rng.integers(0, 5, size=(n,)).astype(np.int32))
    ys0 = jnp.asarray(rng.integers(-6, 20, size=(n,)).astype(np.int32))
    xs0 = jnp.asarray(rng.integers(-6, 76, size=(n,)).astype(np.int32))
    for patch in (9, 17, 33):  # one-row, boundary, wide two-block fetch
        np.testing.assert_array_equal(
            np.asarray(
                gather_patches_multi(mgot, vol_sel, layer, ys0, xs0, patch)
            ),
            np.asarray(
                gather_patches_multi(mref, vol_sel, layer, ys0, xs0, patch)
            ),
        )


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


def test_cube_pack_rows_matches_xla():
    """The Pallas cube-pack kernel equals gather.cube_rows_xla bit-for-bit
    (pure data movement) across odd shapes."""
    import numpy as np

    from sift_tpu.ops.gather import cube_rows_xla
    from sift_tpu.ops.pallas_relayout import cube_pack_rows

    rng = np.random.default_rng(3)
    # (1, 5, 40, 69): stride-divisible width ((w-3) % 22 == 0) — the extra
    # last block from the advisor's round-4 nbp fix must round-trip too.
    # Both sides zero-fill rows past H, so the comparison is whole-buffer.
    for shape, strip in [
        ((2, 5, 96, 200), 64), ((1, 5, 70, 23), 16),
        ((2, 5, 9, 47), 8), ((1, 5, 40, 69), 32),
    ]:
        d = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        ref = np.asarray(cube_rows_xla(d, strip))
        got = np.asarray(cube_pack_rows(d, strip, interpret=True))
        np.testing.assert_array_equal(ref, got)
