"""Twin-row fused front: layout + gather equivalence (interpret mode)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _cfg_hks():
    from sift_tpu import SiftConfig
    from sift_tpu.config import gaussian_half_kernel

    cfg = SiftConfig()
    hks = [gaussian_half_kernel(s) for s in cfg.gaussian_kernels()[1:]]
    return cfg, hks


def test_twin_strided_xla_gathers_match_multi_rows():
    """Patch/cube gathers through the strip-major layout equal the row-major
    MultiRows gathers (pure data movement)."""
    from sift_tpu.ops.gather import (
        MultiRows,
        build_multi_rows,
        gather_cubes_multi,
        gather_patches_multi,
    )
    from sift_tpu.ops.pallas_pyramid import twin_strided_xla

    rng = np.random.default_rng(0)
    shapes = [(5, 40, 200), (5, 20, 100)]
    vols = [jnp.asarray(rng.normal(size=s).astype(np.float32)) for s in shapes]
    blk, st = 64, 16
    mr_ref = build_multi_rows(vols, blk=blk)

    rows, bases = [], []
    acc = 0
    for v in vols:
        nb = -(-v.shape[2] // blk)
        unit = v.shape[0] * nb * st
        acc = -(-acc // unit) * unit
        bases.append(acc)
        t = twin_strided_xla(v[None], blk, st, 0, v.shape[0])[0]
        rows.append((acc, t))
        acc += t.shape[0]
    buf = jnp.zeros((acc, 2 * blk), jnp.float32)
    for base, t in rows:
        buf = jax.lax.dynamic_update_slice(buf, t, (base, 0))
    mr_new = MultiRows(
        rows=buf, shapes=tuple(shapes), blk=blk,
        nbs=tuple(-(-s[2] // blk) for s in shapes),
        bases=tuple(bases), shp=(st.bit_length() - 1,) * 2,
        nls=tuple(s[0] for s in shapes),
    )

    n = 300
    oct_id = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
    hs = np.array([shapes[o][1] for o in np.asarray(oct_id)])
    ws = np.array([shapes[o][2] for o in np.asarray(oct_id)])
    z = rng.integers(1, 4, n)
    y = np.minimum(rng.integers(1, 39, n), hs - 2)
    x = np.minimum(rng.integers(1, 199, n), ws - 2)
    zyx = jnp.asarray(np.stack([z, y, x], -1).astype(np.int32))
    c_ref = gather_cubes_multi(mr_ref, oct_id, zyx)
    c_new = gather_cubes_multi(mr_new, oct_id, zyx)
    np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_new))

    for patch in (9, 80):  # single and two-block fetch classes
        layer = jnp.asarray(rng.integers(0, 5, n).astype(np.int32))
        ys0 = jnp.asarray((y - patch // 2).astype(np.int32))
        xs0 = jnp.asarray(np.maximum(x - patch // 2, 0).astype(np.int32))
        p_ref = gather_patches_multi(mr_ref, oct_id, layer, ys0, xs0, patch)
        p_new = gather_patches_multi(mr_new, oct_id, layer, ys0, xs0, patch)
        np.testing.assert_array_equal(np.asarray(p_ref), np.asarray(p_new))


@pytest.mark.parametrize("hw", [(96, 160), (300, 160)])
def test_fused_front_twin_matches_front(hw):
    """The twin kernel's gauss buffer equals twin_strided_xla of the plain
    front's stack EXACTLY (same blur chain, different output layout), its
    plain DoG stack equals the plain front's, and mask/counts/down match."""
    from sift_tpu.ops.pallas_pyramid import (
        front_twin_strip,
        fused_octave_front,
        fused_octave_front_twin,
        twin_strided_xla,
    )

    cfg, hks = _cfg_hks()
    n = len(hks)
    thr = cfg.extremum_threshold()
    rng = np.random.default_rng(4)
    from sift_tpu.ops.blur import gaussian_blur

    img = jnp.asarray(
        gaussian_blur(
            jnp.asarray(rng.uniform(0, 255, (2,) + hw).astype(np.float32)), 2.0
        )
    )
    h, w = hw
    blk, g_l0, g_nl = 64, 1, n - 2
    st = front_twin_strip((h, w), hks, g_nl, blk)
    assert st is not None
    nbt = -(-w // blk)
    nstrips = -(-h // st)
    gbuf = jnp.full((2, nstrips * g_nl * nbt * st, 2 * blk), -1.0, jnp.float32)
    gbuf, pk, m, c, down = fused_octave_front_twin(
        img, hks, thr, gbuf, 0, st, blk, g_l0, g_nl, interpret=True
    )

    g2, d2, m2, c2 = fused_octave_front(img, hks, thr, interpret=True)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(c), np.asarray(c2))
    np.testing.assert_array_equal(
        np.asarray(down), np.asarray(g2[:, g2.shape[1] - 3])
    )

    # The kernel's cube-packed DoG rows == the XLA packing of the plain
    # front's DoG stacks, in the strip-block-major order (rows covering
    # image rows >= H are padding the gather never reads: the kernel fills
    # them with edge-padded blur values, cube_rows_xla with zeros — mask
    # them out of the comparison).
    from sift_tpu.ops.gather import cube_rows_params, cube_rows_xla

    _, _, nbp = cube_rows_params(n, w)
    pk_ref = np.asarray(cube_rows_xla(d2, st))
    pk_got = np.asarray(pk)
    assert pk_got.shape == pk_ref.shape
    pk_def = np.ones(pk_ref.shape[1], bool)
    for s in range(nstrips):
        lo = h - s * st
        if lo < st:  # partial strip: rows [lo, st) of each block undefined
            for cb in range(nbp):
                off = (s * nbp + cb) * st
                pk_def[off + max(lo, 0) : off + st] = False
    np.testing.assert_array_equal(pk_got[:, pk_def], pk_ref[:, pk_def])
    gt_ref = twin_strided_xla(g2, blk, st, g_l0, g_nl)
    # rows holding image rows >= H are padding (undefined); compare only
    # defined rows: strip s covers image rows [s*st, min(H, (s+1)*st))
    def defined(rows_like, nl):
        mrows = np.ones(rows_like.shape[1], bool)
        for s in range(nstrips):
            lo = h - s * st
            if lo < st:  # partial strip: rows [lo, st) of each block undefined
                for l in range(nl):
                    for b in range(nbt):
                        off = ((s * nl + l) * nbt + b) * st
                        mrows[off + max(lo, 0): off + st] = False
        return mrows

    gm = defined(gt_ref, g_nl)
    np.testing.assert_array_equal(
        np.asarray(gbuf)[:, gm], np.asarray(gt_ref)[:, gm]
    )

    # Native u-row-unit emission (production path): the unit-view buffer is
    # exactly the (R, 2blk) -> (R/u, u*2blk) reshape of the twin buffer —
    # same bytes, no relayout pass.
    u = 8
    R = nstrips * g_nl * nbt * st
    gbuf_u = jnp.full((2, R // u, u * 2 * blk), -1.0, jnp.float32)
    gbuf_u, pk_u, m_u, c_u, down_u = fused_octave_front_twin(
        img, hks, thr, gbuf_u, 0, st, blk, g_l0, g_nl, interpret=True, unit=u
    )
    np.testing.assert_array_equal(np.asarray(m_u), np.asarray(m2))
    np.testing.assert_array_equal(
        np.asarray(gbuf_u).reshape(2, R, 2 * blk)[:, gm],
        np.asarray(gt_ref)[:, gm],
    )


def test_gather_cubes_packed_matches_multi_rows():
    """The cube-packed layout (gather.CubeRows) returns bit-identical cubes
    to the twin-row gather across octaves, depths and borders — pure data
    movement either way, 3 row fetches instead of 9."""
    from sift_tpu.ops.gather import (
        CubeRows,
        build_multi_rows,
        cube_rows_params,
        cube_rows_xla,
        gather_cubes_multi,
        gather_cubes_packed,
    )

    rng = np.random.default_rng(0)
    # (5, 40, 69): (w-3) % stride == 0 (stride 22) — the advisor's round-4
    # case where nbp was one block short and x = w-2 aliased into the next
    # DoG layer's lanes.
    shapes = [(5, 40, 200), (5, 20, 100), (5, 9, 23), (5, 40, 69)]
    vols = [jnp.asarray(rng.normal(size=s).astype(np.float32)) for s in shapes]
    mr = build_multi_rows(vols, blk=64)
    rows, bases, nbps = [], [], []
    acc = 0
    for v in vols:
        stride, sw, nbp = cube_rows_params(v.shape[0], v.shape[2])
        r = cube_rows_xla(v[None])[0]
        bases.append(acc)
        nbps.append(nbp)
        acc += r.shape[0]
        rows.append(r)
    cr = CubeRows(
        rows=jnp.concatenate(rows, 0), shapes=tuple(shapes),
        nbps=tuple(nbps), bases=tuple(bases), stride=stride, sw=sw,
    )
    n = 500
    oct_id = rng.integers(0, len(shapes), n).astype(np.int32)
    hs = np.array([shapes[o][1] for o in oct_id])
    ws = np.array([shapes[o][2] for o in oct_id])
    z = rng.integers(1, 4, n)
    y = 1 + rng.integers(0, 1000, n) % (hs - 2)
    x = 1 + rng.integers(0, 1000, n) % (ws - 2)
    # Pin the last-interior-column case (x = w-2) on every octave,
    # including the stride-divisible w=69 one.
    for i, o in enumerate(range(len(shapes))):
        oct_id[i] = o
        x[i] = shapes[o][2] - 2
        hs[i] = shapes[o][1]
        ws[i] = shapes[o][2]
        y[i] = min(y[i], hs[i] - 2)
    zyx = jnp.asarray(np.stack([z, y, x], -1).astype(np.int32))
    c_ref = np.asarray(gather_cubes_multi(mr, jnp.asarray(oct_id), zyx))
    c_new = np.asarray(gather_cubes_packed(cr, jnp.asarray(oct_id), zyx))
    np.testing.assert_array_equal(c_ref, c_new)

    # Strip-block-major order (the shared-buffer production layout, per-
    # octave strips, ls > 0): same cubes bit-for-bit.
    strips = (16, 8, 8, 32)
    rows_s, bases_s = [], []
    acc = 0
    for v, st in zip(vols, strips):
        _, _, nbp = cube_rows_params(v.shape[0], v.shape[2])
        unit = nbp * st
        acc = -(-acc // unit) * unit
        bases_s.append(acc)
        r = cube_rows_xla(v[None], st)[0]
        acc += r.shape[0]
        rows_s.append((bases_s[-1], r))
    buf = np.zeros((acc, 128), np.float32)
    for base, r in rows_s:
        buf[base : base + r.shape[0]] = np.asarray(r)
    cr_s = CubeRows(
        rows=jnp.asarray(buf), shapes=tuple(shapes),
        nbps=tuple(nbps), bases=tuple(bases_s), stride=stride, sw=sw,
        lss=tuple(st.bit_length() - 1 for st in strips),
    )
    c_strip = np.asarray(gather_cubes_packed(cr_s, jnp.asarray(oct_id), zyx))
    np.testing.assert_array_equal(c_ref, c_strip)


def test_unit_gather_matches_per_row_path():
    """with_row_units attached: gather_patches_multi's u-row unit fast path
    (unit fetch + one-hot row/col extraction) is bit-identical to the
    per-row gather, including negative/clamped window rows at image edges
    and the wide two-block stitch."""
    from sift_tpu.ops.pallas_pyramid import twin_strided_xla
    from sift_tpu.ops.gather import (
        MultiRows,
        gather_patches_multi,
        row_unit_size,
        with_row_units,
    )

    rng = np.random.default_rng(11)
    shapes = [(5, 64, 200), (5, 32, 100)]
    vols = [jnp.asarray(rng.normal(size=s).astype(np.float32)) for s in shapes]
    blk, st = 64, 16
    rows, bases = [], []
    acc = 0
    for v in vols:
        t = twin_strided_xla(v[None], blk, st, 0, v.shape[0])[0]
        bases.append(acc)
        acc += t.shape[0]
        rows.append(t)
    mr = MultiRows(
        rows=jnp.concatenate(rows, 0), shapes=tuple(shapes), blk=blk,
        nbs=tuple(-(-s[2] // blk) for s in shapes), bases=tuple(bases),
        shp=(st.bit_length() - 1,) * 2, nls=tuple(s[0] for s in shapes),
    )
    mru = with_row_units(mr)
    assert mru.rows_u is not None and row_unit_size(mr) == 8

    n = 200
    oct_id = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
    hs = np.array([shapes[o][1] for o in np.asarray(oct_id)])
    ws = np.array([shapes[o][2] for o in np.asarray(oct_id)])
    layer = jnp.asarray(rng.integers(0, 5, n).astype(np.int32))
    # Edge-heavy positions: include windows hanging off every border.
    y = rng.integers(-5, 70, n) % (hs + 10) - 5
    x = rng.integers(-5, 210, n) % (ws + 10) - 5
    for patch in (9, 33, 80):  # narrow, mid, two-block wide
        ys0 = jnp.asarray((y - patch // 2).astype(np.int32))
        xs0 = jnp.asarray((x - patch // 2).astype(np.int32))
        p_u = gather_patches_multi(mru, oct_id, layer, ys0, xs0, patch)
        p_r = gather_patches_multi(mr, oct_id, layer, ys0, xs0, patch)
        np.testing.assert_array_equal(np.asarray(p_u), np.asarray(p_r))
