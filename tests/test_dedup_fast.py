"""dedup_compact (payload-sort path) vs compact(sort_and_dedup(.)) equality."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from sift_tpu.utils import keypoints as kputil


def _random_kp(rng, n, n_dup, dtype):
    x = rng.uniform(0, 640, n).astype(dtype)
    y = rng.uniform(0, 480, n).astype(dtype)
    size = rng.uniform(1, 8, n).astype(dtype)
    pori = rng.uniform(0, 6.28, n).astype(dtype)
    octave = rng.integers(0, 8, n).astype(np.int32)
    layer = rng.integers(1, 4, n).astype(np.int32)
    valid = rng.uniform(size=n) < 0.8
    # inject duplicate runs (same x/y/size/pori, different octave/layer) —
    # the exact pattern clean_keypoints collapses (src/sift.hh:25-27)
    for _ in range(n_dup):
        i, j = rng.integers(0, n, 2)
        x[j], y[j], size[j], pori[j] = x[i], y[i], size[i], pori[i]
        valid[j] = valid[i] = True
    return kputil.Keypoints(
        x=jnp.asarray(x), y=jnp.asarray(y), octave=jnp.asarray(octave),
        layer=jnp.asarray(layer), size=jnp.asarray(size),
        pori=jnp.asarray(pori), desc=jnp.zeros((n, 128), jnp.uint8),
        valid=jnp.asarray(valid),
    )


def test_dedup_compact_matches_reference_path():
    rng = np.random.default_rng(11)
    for n, out_cap, n_dup in [(256, 256, 40), (256, 128, 40), (64, 96, 10),
                              (256, 256, 0)]:
        kp = _random_kp(rng, n, n_dup, np.float32)
        want = kputil.compact(kputil.sort_and_dedup(kp), out_cap)
        got = kputil.dedup_compact(kp, out_cap)
        wv, gv = np.asarray(want.valid), np.asarray(got.valid)
        assert (wv == gv).all()
        for f in ("x", "y", "octave", "layer", "size", "pori"):
            np.testing.assert_array_equal(
                np.asarray(getattr(want, f))[wv], np.asarray(getattr(got, f))[gv]
            )
        assert not np.asarray(got.desc).any()
        # invalid lanes are sanitized (finite) for downstream int casts
        assert np.isfinite(np.asarray(got.x)).all()


def test_dedup_compact_f64():
    rng = np.random.default_rng(12)
    kp = _random_kp(rng, 128, 20, np.float64)
    kp = dataclasses.replace(
        kp,
        x=kp.x.astype(jnp.float64), y=kp.y.astype(jnp.float64),
        size=kp.size.astype(jnp.float64), pori=kp.pori.astype(jnp.float64),
    )
    want = kputil.compact(kputil.sort_and_dedup(kp), 128)
    got = kputil.dedup_compact(kp, 128)
    wv, gv = np.asarray(want.valid), np.asarray(got.valid)
    assert (wv == gv).all()
    for f in ("x", "y", "size", "pori", "octave"):
        np.testing.assert_array_equal(
            np.asarray(getattr(want, f))[wv], np.asarray(getattr(got, f))[gv]
        )


def test_compact_sort_based_equals_naive():
    """The payload-carrying sort compact returns bit-identical valid lanes
    (and extras) to the compact_mask + per-field take formulation."""
    import dataclasses

    import numpy as np

    import jax.numpy as jnp

    from sift_tpu.utils.keypoints import Keypoints, compact, compact_indices

    rng = np.random.default_rng(7)
    for n, cap in ((64, 32), (128, 128), (96, 160)):
        valid = rng.random(n) < 0.6
        kp = Keypoints(
            x=jnp.asarray(rng.normal(size=n).astype(np.float32)),
            y=jnp.asarray(rng.normal(size=n).astype(np.float32)),
            octave=jnp.asarray(rng.integers(0, 8, n).astype(np.int32)),
            layer=jnp.asarray(rng.integers(0, 5, n).astype(np.int32)),
            size=jnp.asarray(rng.normal(size=n).astype(np.float32)),
            pori=jnp.asarray(rng.normal(size=n).astype(np.float32)),
            desc=jnp.asarray(rng.integers(0, 255, (n, 128)).astype(np.uint8)),
            valid=jnp.asarray(valid),
        )
        extra = jnp.asarray(rng.normal(size=n).astype(np.float32))
        out, ex = compact(kp, cap, extra=extra)

        idx, in_range = compact_indices(kp.valid, cap)
        ref = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), kp)
        ref = dataclasses.replace(ref, valid=ref.valid & in_range)
        ref_ex = jnp.take(extra, idx, axis=0)

        v = np.asarray(out.valid)
        np.testing.assert_array_equal(v, np.asarray(ref.valid))
        for fld in ("x", "y", "octave", "layer", "size", "pori"):
            np.testing.assert_array_equal(
                np.asarray(getattr(out, fld))[v],
                np.asarray(getattr(ref, fld))[v], err_msg=fld,
            )
        np.testing.assert_array_equal(
            np.asarray(out.desc)[v], np.asarray(ref.desc)[v]
        )
        np.testing.assert_array_equal(np.asarray(ex)[v], np.asarray(ref_ex)[v])
