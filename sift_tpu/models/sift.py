"""End-to-end SIFT pipeline orchestrator.

TPU-native rebuild of detect_keypoints_and_descriptors (src/sift.cpp:712-776),
minus the reference's design warts: no PNG side effect inside the detection
API (src/sift.cpp:766-768), no stdout logging interleaved with compute, no
per-extremum deep copies.

Execution model: every stage runs on fixed-capacity buffers with static
shapes.  The PRODUCTION path fuses all octaves per stage — six compiled
programs per sweep:

  1. pyramids (gaussian + DoG, octave loop unrolled at trace time)
  2. detect+refine (every octave's extremum mask -> ONE global compaction ->
     one mixed-octave Newton refinement over MultiRows gathers)
  3. gaussian MultiRows relayout (shared by orientation + descriptors)
  4. orientation (mixed-octave, one program)
  5. dedup (sort + unique) + compact
  6. descriptors (mixed-octave, one program)

The earlier per-octave stage-wise path survives as ``detect_stages`` for
debugging and the f64 bit-parity profile; ``detect_and_describe_batch``
(production) is cross-checked against it by tests.

Capacity semantics differ between the two paths: the fused path treats
``extrema_cap`` / ``kp_cap`` as GLOBAL (all octaves) capacities, the staged
path as octave-0 capacities halved per octave.  Both detect overflow by
comparing true counts against capacity (see ``counts`` below).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sift_tpu.config import SiftConfig
from sift_tpu.models.descriptor import (
    compute_descriptors_all,
    compute_octave_descriptors,
)
from sift_tpu.models.detect import (
    detect_extrema_all,
    detect_octave_extrema,
    refine_keypoints_all,
    refine_octave_keypoints,
)
from sift_tpu.models.orient import orient_all, orient_octave_keypoints
from sift_tpu.models.pyramid import build_pyramids, compute_initial_image
from sift_tpu.ops.gather import build_multi_rows, compact_mask
from sift_tpu.ops.resize import (
    downsample_nearest_x2,
    downsample_nearest_x2_mxu,
)
from sift_tpu.utils import keypoints as kputil
from sift_tpu.utils.keypoints import Keypoints


def detect_fn(img: jnp.ndarray, cfg: SiftConfig, octaves: int) -> Keypoints:
    """Traceable fused detect+describe for a fixed image shape.

    img: (H, W[, C]).  One traced graph (suitable for vmap / shard_map
    composition); production entry points run the same stages as separate
    persistently-cached programs instead.
    """
    # Force the XLA blur here: this trace composes under vmap, and jax's
    # pallas batching rule lifts the batch dim into the block shape (VMEM
    # overflow for big images).
    cfg_x = dataclasses.replace(
        cfg, use_pallas_blur=False, use_pallas_pyramid=False
    )
    initial = compute_initial_image(img, cfg_x)
    gaussians, dogs = build_pyramids(initial, cfg_x, octaves)
    kp, _off0, _counts = _detect_refine_fused(dogs, cfg)
    mr = build_multi_rows(gaussians)
    cand = orient_all(mr, kp, cfg)
    cand = kputil.compact(cand, cfg.ori_cap)
    allkp = kputil.compact(kputil.sort_and_dedup(cand), cfg.ori_cap)
    desc = compute_descriptors_all(mr, allkp, cfg)
    return dataclasses.replace(allkp, desc=desc)


def _detect_refine_fused(dogs, cfg: SiftConfig, mr=None):
    """All octaves: extrema -> Newton refine -> compact to cfg.kp_cap.

    Returns (keypoints, off0, counts): ``off0`` is the converged layer offset
    per lane (the f64 parity profile recomputes kp.size from it on the host
    with glibc pow); counts = (n_extrema, n_refined, n_active) are the TRUE
    stage counts for capacity-overflow detection (n_extrema >
    cfg.extrema_cap, n_refined > cfg.kp_cap, or n_active > the phase-2
    Newton capacity means real detections were clipped).
    """
    oct_id, zyx, valid, n_ext = detect_extrema_all(
        dogs, cfg.extremum_threshold(), cfg.extrema_cap, cfg.window_size
    )
    kp, off0, n_active = refine_keypoints_all(
        dogs, oct_id, zyx, valid, cfg, mr=mr
    )
    n_ref = jnp.sum(kp.valid, dtype=jnp.int32)
    kp, off0 = kputil.compact(kp, cfg.kp_cap, extra=off0)
    return kp, off0, (n_ext, n_ref, n_active)


# --- fused production programs (separately jitted + persistently cached;
# dispatch is async so the six programs pipeline back-to-back on device) ---


def _batch_multi_rows(vols_b, blk: int):
    """Batched MultiRows: per-octave Pallas kernels write STRIP-INTERLEAVED
    twin rows straight into one shared gather buffer (input_output_aliases),
    so neither the XLA concat of the 2x-inflated rows (~9.5 ms per relayout
    at batch 16) nor the materialized lane-padding copy remains.  Row
    contents are identical to build_multi_rows; only the row order differs
    (MultiRows.shp)."""
    from sift_tpu.ops.pallas_relayout import twin_rows_strips

    return twin_rows_strips(vols_b, blk)


def _use_pallas_relayout(vols_b) -> bool:
    return (
        jax.default_backend() == "tpu" and vols_b[0].dtype == jnp.float32
    )


def _use_front(cfg: SiftConfig) -> bool:
    """Route the batch pipeline through the fused octave FRONT (Pallas blur
    chain emitting gauss/DoG stacks + extremum masks + popcounts in one
    pass) — the production default on TPU f32.  Explicitly setting
    ``use_pallas_pyramid=True`` forces it on any backend (interpret mode on
    CPU, for tests)."""
    if cfg.window_size != 3 or jnp.dtype(cfg.dtype) != jnp.float32:
        return False
    if cfg.use_pallas_pyramid is True:
        return True
    return cfg.use_pallas_pyramid is None and jax.default_backend() == "tpu"


def _front_twin_plan(cfg: SiftConfig, octaves: int, h1: int, w1: int):
    """Static per-octave plan for the twin-front gather buffers.

    (h1, w1): initial (post-doubling) image dims.  Returns
    (plan, g_total, half_kernels, g_l0, g_nl, n, blk) where each
    plan entry is (h, w, st, fits, nbt, gbase).
    """
    from sift_tpu.config import gaussian_half_kernel
    from sift_tpu.models.detect import _REFINE_BLK
    from sift_tpu.ops.pallas_pyramid import front_twin_strip

    hks = [gaussian_half_kernel(s) for s in cfg.gaussian_kernels()[1:]]
    n = len(hks)
    g_l0, g_nl = 1, n - 2  # stored gauss layers [1, intervals]
    blk = _REFINE_BLK
    plan = []
    gacc = 0
    h, w = h1, w1
    for _ in range(octaves):
        nbt = -(-w // blk)
        st = front_twin_strip((h, w), hks, g_nl, blk, cfg.dtype)
        fits = st is not None
        if st is None:  # XLA fallback octave: any power-of-two strip works
            hp2 = 1 << max(h - 1, 7).bit_length()
            st = min(128, max(32, hp2))
        nstrips = -(-h // st)
        g_unit = g_nl * nbt * st
        gacc = -(-gacc // g_unit) * g_unit
        plan.append((h, w, st, fits, nbt, gacc))
        gacc += nstrips * g_unit
        h, w = h // 2, w // 2
    return plan, gacc, hks, g_l0, g_nl, n, blk


@partial(jax.jit, static_argnums=(1, 2))
def _jit_front_twin_batch(imgs, cfg: SiftConfig, octaves: int):
    """Pyramids + extremum masks + popcounts + twin-row gather spaces in one
    program (batched): the production TPU path.

    The per-octave Pallas kernel (fused_octave_front_twin) writes the gauss
    and DoG twin-block rows straight into two shared gather buffers, so the
    plain stacks — and the two relayout passes that re-read them in the
    round-3 pipeline — are never materialized.  Octaves too wide for VMEM
    fall back to the XLA front + XLA twin construction (identical layout).
    Returns (gauss MultiRows, dog MultiRows, masks, counts).
    """
    from sift_tpu.models.detect import octave_front_xla
    from sift_tpu.ops.gather import CubeRows, MultiRows, cube_rows_params
    from sift_tpu.ops.pallas_pyramid import (
        fused_octave_front_twin,
        twin_strided_xla,
    )
    from sift_tpu.ops.pallas_relayout import cube_pack_rows

    thr = cfg.extremum_threshold()
    img = compute_initial_image(imgs, cfg)
    b, h1, w1 = img.shape
    plan, g_total, hks, g_l0, g_nl, n, blk = _front_twin_plan(
        cfg, octaves, h1, w1
    )
    # The kernels emit the u-row-unit VIEW of the twin layout natively
    # (gbuf row i = twin rows [i*u, (i+1)*u) side by side), so the
    # per-sweep attach_row_units_batched relayout (~2 ms) — and the
    # pass-through copies of the 2x-inflated rows it implied — never
    # happen; consumers run the unit gather fast path directly.
    u = min(8, *(p[2] for p in plan))
    # Sublane-align the unit-view row count: with g_total // u % 8 != 0 the
    # flat ``rows_u`` reshape below is a real 675 MB relayout copy (tiled
    # T(8,128) rows pad per batch element); padded to a whole sublane tile
    # it compiles to a bitcast.  The pad rows are never written or read.
    g_total = -(-g_total // (8 * u)) * (8 * u)
    # The first fitting octave's kernel CREATES the buffer (ShapeDtypeStruct
    # sentinel -> no aliased input): skips the XLA zeros-fill of the ~800 MB
    # batch-16 gather space.  Blocks outside written octave regions stay
    # undefined — gathers never index them (bases skip alignment gaps; rows
    # past H within a region are kernel-written padding).
    gbuf = jax.ShapeDtypeStruct((b, g_total // u, u * 2 * blk), cfg.dtype)
    # Shared cube-packed DoG buffer (gather.CubeRows strip-block-major
    # order, ls = log2(st) per octave): each octave's kernel writes its
    # region in place (create/alias mode, same pattern as gbuf), so the
    # per-octave pk buffers — and the ~5 ms XLA concatenation chain
    # (8 x 165 MB copy+update-slice fusions + a 165 MB layout copy) that
    # assembled them in round 4 — never exist.
    cstride, csw, _ = cube_rows_params(n, plan[0][1])
    pk_bases, pk_nbps = [], []
    pkacc = 0
    for h, w, st, fits, nbt, gbase in plan:
        _, _, nbp = cube_rows_params(n, w)
        pk_unit = nbp * st
        pkacc = -(-pkacc // pk_unit) * pk_unit
        pk_bases.append(pkacc)
        pk_nbps.append(nbp)
        pkacc += (-(-h // st)) * pk_unit
    pkbuf = jax.ShapeDtypeStruct((b, pkacc, 128), cfg.dtype)
    masks, counts = [], []
    for (h, w, st, fits, nbt, gbase), pkbase in zip(plan, pk_bases):
        if fits:
            g_unit = g_nl * nbt * st
            if g_unit % (8 * u) == 0:
                gbuf, pkbuf, m, c, down = fused_octave_front_twin(
                    img, hks, thr, gbuf, gbase, st, blk, g_l0, g_nl, unit=u,
                    pkbuf=pkbuf, pkbase=pkbase,
                )
            else:
                # Small octave whose unit-view block is not sublane-aligned
                # (g_unit // u % 8 != 0, Mosaic rejects the out spec): run
                # the kernel in twin-row mode into a temp and fold the
                # (cheap, tail-octave-sized) reshape in XLA.
                nstr = -(-h // st)
                tmp = jax.ShapeDtypeStruct(
                    (b, nstr * g_unit, 2 * blk), cfg.dtype
                )
                tmp, pkbuf, m, c, down = fused_octave_front_twin(
                    img, hks, thr, tmp, 0, st, blk, g_l0, g_nl,
                    pkbuf=pkbuf, pkbase=pkbase,
                )
                if isinstance(gbuf, jax.ShapeDtypeStruct):
                    gbuf = jnp.zeros(gbuf.shape, gbuf.dtype)
                gbuf = jax.lax.dynamic_update_slice(
                    gbuf,
                    tmp.reshape(b, nstr * g_unit // u, u * 2 * blk),
                    (0, gbase // u, 0),
                )
            wpm = -(-w // 128) * 128
            if wpm > w:  # lane-pad to whole 128-blocks (small octaves only)
                m = jnp.pad(m, ((0, 0), (0, 0), (0, 0), (0, wpm - w)))
        else:
            g, d, m, c = octave_front_xla(img, hks, thr, cfg.window_size)
            gt = twin_strided_xla(g, blk, st, g_l0, g_nl)
            gt = gt.reshape(b, gt.shape[1] // u, u * 2 * blk)
            if isinstance(gbuf, jax.ShapeDtypeStruct):
                gbuf = jnp.zeros(gbuf.shape, gbuf.dtype)
            gbuf = jax.lax.dynamic_update_slice(gbuf, gt, (0, gbase // u, 0))
            down = g[:, g.shape[1] - 3]
            if isinstance(pkbuf, jax.ShapeDtypeStruct):
                pkbuf = jnp.zeros(pkbuf.shape, pkbuf.dtype)
            pkbuf = jax.lax.dynamic_update_slice(
                pkbuf, cube_pack_rows(d, st), (0, pkbase, 0)
            )
        masks.append(m)
        counts.append(c)
        img = downsample_nearest_x2_mxu(down)
    shp = tuple(p[2].bit_length() - 1 for p in plan)
    gmr = MultiRows(
        rows=None,
        shapes=tuple((n + 1, p[0], p[1]) for p in plan),
        blk=blk,
        nbs=tuple(p[4] for p in plan),
        # bases pre-shifted by -l0*nb*st (gather.MultiRows.nls layout)
        bases=tuple(p[5] - g_l0 * p[4] * p[2] for p in plan),
        shp=shp,
        nls=(g_nl,) * octaves,
        # Flat merged coordinates ((B*G/u, u*2blk)).  Measured A/B: emitting
        # the batched 3D view and collapsing inside each consumer program
        # costs MORE (161 vs 175 fps — the collapse materializes per
        # consumer), so the one producer-side reshape stays.
        rows_u=gbuf.reshape(-1, u * 2 * blk),
        unit=u,
    )
    # Cube-packed DoG rows: 3 row gathers per Newton cube instead of 9
    # (gather.CubeRows) — and ~45% smaller than the old DoG twin rows.
    dmr = CubeRows(
        rows=pkbuf,
        shapes=tuple((n, p[0], p[1]) for p in plan),
        nbps=tuple(pk_nbps),
        bases=tuple(pk_bases),
        stride=cstride,
        sw=csw,
        lss=shp,
    )
    return gmr, dmr, masks, counts


@partial(jax.jit, static_argnums=(3,))
def _jit_detect_refine_counts_mr(masks, counts, dmr, cfg: SiftConfig):
    """Counts-assisted extrema compaction + mixed-octave Newton refinement
    off the DoG twin gather space (no plain DoG stacks anywhere)."""
    from sift_tpu.models.detect import extrema_from_counts

    oct_id, zyx, valid, n_ext = extrema_from_counts(
        masks, counts, cfg.extrema_cap
    )

    def one(o, z, v, m):
        kp, off0, n_active = refine_keypoints_all(None, o, z, v, cfg, mr=m)
        n_ref = jnp.sum(kp.valid, dtype=jnp.int32)
        kp, off0 = kputil.compact(kp, cfg.kp_cap, extra=off0)
        return kp, off0, (n_ref, n_active)

    kp, off0, (n_ref, n_active) = jax.vmap(one)(oct_id, zyx, valid, dmr)
    return kp, off0, (n_ext, n_ref, n_active)


@partial(jax.jit, static_argnums=(1, 2))
def _jit_front_batch(imgs, cfg: SiftConfig, octaves: int):
    """Pyramids + extremum masks + popcounts in one program (batched).

    Per octave the Pallas front kernel emits (gauss stack, DoG stack, mask,
    counts) from a single VMEM pass; octaves too wide for VMEM fall back to
    the XLA equivalent (same layouts).  Returns four per-octave lists.
    """
    from sift_tpu.config import gaussian_half_kernel
    from sift_tpu.models.detect import octave_front_xla
    from sift_tpu.models.pyramid import compute_initial_image
    from sift_tpu.ops.pallas_pyramid import (
        fused_octave_front,
        fused_octave_front_fits,
    )

    kernels = cfg.gaussian_kernels()
    half_kernels = [gaussian_half_kernel(s) for s in kernels[1:]]
    thr = cfg.extremum_threshold()
    img = compute_initial_image(imgs, cfg)
    gaussians, dogs, masks, counts = [], [], [], []
    for _ in range(octaves):
        if fused_octave_front_fits(img.shape, half_kernels, cfg.dtype):
            g, d, m, c = fused_octave_front(img, half_kernels, thr)
            w = m.shape[-1]
            wpm = -(-w // 128) * 128
            if wpm > w:  # lane-pad to whole 128-blocks (small octaves only)
                m = jnp.pad(m, ((0, 0), (0, 0), (0, 0), (0, wpm - w)))
        else:
            g, d, m, c = octave_front_xla(
                img, half_kernels, thr, cfg.window_size
            )
        gaussians.append(g)
        dogs.append(d)
        masks.append(m)
        counts.append(c)
        img = downsample_nearest_x2(g[:, g.shape[1] - 3])
    return gaussians, dogs, masks, counts


@partial(jax.jit, static_argnums=(3,))
def _jit_detect_refine_counts(dogs, masks, counts, cfg: SiftConfig):
    """Counts-assisted extrema compaction + mixed-octave Newton refinement."""
    from sift_tpu.models.detect import _REFINE_BLK, extrema_from_counts

    oct_id, zyx, valid, n_ext = extrema_from_counts(
        masks, counts, cfg.extrema_cap
    )
    if _use_pallas_relayout(dogs):
        mr = _batch_multi_rows(dogs, _REFINE_BLK)
    else:
        mr = jax.vmap(lambda ds: build_multi_rows(ds, blk=_REFINE_BLK))(dogs)

    def one(ds, o, z, v, m):
        kp, off0, n_active = refine_keypoints_all(ds, o, z, v, cfg, mr=m)
        n_ref = jnp.sum(kp.valid, dtype=jnp.int32)
        kp, off0 = kputil.compact(kp, cfg.kp_cap, extra=off0)
        return kp, off0, (n_ref, n_active)

    kp, off0, (n_ref, n_active) = jax.vmap(one)(dogs, oct_id, zyx, valid, mr)
    return kp, off0, (n_ext, n_ref, n_active)


@partial(jax.jit, static_argnums=(1,))
def _jit_detect_refine_batch(dogs, cfg: SiftConfig):
    from sift_tpu.models.detect import _REFINE_BLK

    if _use_pallas_relayout(dogs):
        mr = _batch_multi_rows(dogs, _REFINE_BLK)
        return jax.vmap(lambda d, m: _detect_refine_fused(d, cfg, mr=m))(
            dogs, mr
        )
    return jax.vmap(lambda d: _detect_refine_fused(d, cfg))(dogs)


@jax.jit
def _jit_gauss_rows_batch(gaussians):
    if _use_pallas_relayout(gaussians):
        # blk=64: the production orientation/descriptor window classes fit
        # one 128-lane twin row (gather_patches_multi fetches a second block
        # only for the rare wide descriptor chunks) — half the gather bytes
        # of blk=128 rows.
        return _batch_multi_rows(gaussians, 64)
    return jax.vmap(lambda gs: build_multi_rows(gs))(gaussians)


def _flatten_batch_lanes(mr, kp):
    """(batch-of-MultiRows, (B, cap) Keypoints) -> merged gather space +
    flattened lanes + per-lane volume index (img * octaves + octave)."""
    from sift_tpu.ops.gather import merge_batch_multi_rows

    b = kp.x.shape[0]
    cap = kp.x.shape[1]
    octaves = len(mr.shapes)
    merged = merge_batch_multi_rows(mr, b)
    flat = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), kp)
    oct_sel = jnp.clip(flat.octave, 0, octaves - 1)
    img_id = jnp.repeat(jnp.arange(b, dtype=oct_sel.dtype), cap)
    return merged, flat, img_id * octaves + oct_sel, b, cap, octaves


def _use_dispatch(cfg: SiftConfig) -> bool:
    """Window-size dispatch reorders f32 sample reductions by ulps (verified
    harmless on the oracle corpus) but the f64 bit-parity profile must run
    the monolithic windows the stage-by-stage audit was recorded with."""
    return jnp.dtype(cfg.dtype) != jnp.float64


# Per-keypoint orientation-candidate slots on the production path: strict
# local maxima over 36 bins allow at most 18 peaks; real images peak at 3-4.
# The honesty counter ``ori_slots_max`` asserts no valid lane exceeded this.
ORI_CAND_SLOTS = 8


@partial(jax.jit, static_argnums=(2,))
def _jit_orient_batch(mr, kp, cfg: SiftConfig):
    """Orientation over a flattened (batch x capacity) lane space; see
    _jit_desc_all_batch for why vmap is avoided (per-chunk lax.switch)."""
    merged, flat, vol_sel, b, cap, octaves = _flatten_batch_lanes(mr, kp)
    if _use_dispatch(cfg):
        # Radius-coherent chunks (see _jit_desc_all_batch): permute lanes by
        # descending octave-local size, un-permute the candidate BLOCKS
        # afterwards so downstream order (and ori_cap overflow behavior) is
        # exactly as unpermuted.  Orientation's pow_denom is 2^-octave (no
        # double-image shift, src/sift.cpp:458).  Candidates are emitted
        # compressed to ORI_CAND_SLOTS per keypoint (order-preserving; see
        # orient_all) so the un-permute gather and the per-image compact
        # sort below run on num_bins/slots-fold fewer lanes.
        key = jnp.where(
            flat.valid,
            flat.size * 2.0 ** (-flat.octave.astype(flat.size.dtype)),
            -1.0,
        )
        perm = jnp.argsort(-key, stable=True)
        inv = jnp.argsort(perm, stable=True)
        flat_p = jax.tree.map(lambda a: a[perm], flat)
        cand, max_peaks = orient_all(
            merged, flat_p, cfg, vol_sel=vol_sel[perm], n_octaves=octaves,
            dispatch_radius=True, cand_slots=ORI_CAND_SLOTS,
        )
        nbins = ORI_CAND_SLOTS
        n_lanes = b * cap
        cand = jax.tree.map(
            lambda a: a.reshape((n_lanes, nbins) + a.shape[1:])[inv].reshape(
                (n_lanes * nbins,) + a.shape[1:]
            ),
            cand,
        )
    else:
        cand = orient_all(
            merged, flat, cfg, vol_sel=vol_sel, n_octaves=octaves,
        )
        nbins = cfg.num_bins
        max_peaks = jnp.asarray(0, jnp.int32)
    cand_b = jax.tree.map(
        lambda a: a.reshape((b, cap * nbins) + a.shape[1:]), cand
    )

    def one(c):
        n_cand = jnp.sum(c.valid, dtype=jnp.int32)
        return kputil.compact(c, cfg.ori_cap), n_cand

    out, n_cand = jax.vmap(one)(cand_b)
    return out, n_cand, max_peaks


@partial(jax.jit, static_argnums=(1,))
def _jit_dedup_compact_batch(cand, cap: int):
    # Payload-carrying sort path: same keys/order/representatives as
    # compact(sort_and_dedup(.)) but no per-lane 1D gathers (A/B probed in
    # scripts/probe_dedup.py; equality in tests/test_dedup_fast.py).
    return jax.vmap(lambda c: kputil.dedup_compact(c, cap))(cand)


@partial(jax.jit, static_argnums=(2,))
def _jit_desc_all_batch(mr, allkp, cfg: SiftConfig):
    """Descriptor stage over a FLATTENED (batch x capacity) lane space.

    vmap over images would force every per-chunk lax.switch branch to
    execute (batched predicate), so instead the B images' octave stacks
    merge into one MultiRows gather space (volume = img * octaves + octave)
    and one lax.map covers all B*cap lanes — each 128-lane chunk then picks
    the smallest descriptor window covering its max radius, and wholly
    invalid chunks (capacity slack) skip the window entirely.
    """
    merged, flat, vol_sel, b, cap, octaves = _flatten_batch_lanes(mr, allkp)
    dispatch = _use_dispatch(cfg)
    if dispatch:
        # The dedup buffer is ordered by the reference's clean_keypoints sort
        # (x-major), which scatters radii across chunks and would send nearly
        # every chunk to the worst-case window.  Permute lanes by descending
        # octave-local size (= descending window radius; invalid lanes last)
        # for the computation only, then invert — per-lane descriptor values
        # don't depend on chunk membership.
        pden = 2.0 ** (
            -(flat.octave - (1 if cfg.double_image_size else 0)).astype(
                flat.size.dtype
            )
        )
        key = jnp.where(flat.valid, flat.size * pden, -1.0)
        perm = jnp.argsort(-key, stable=True)
        inv = jnp.argsort(perm, stable=True)
        flat_p = jax.tree.map(lambda a: a[perm], flat)
        desc = compute_descriptors_all(
            merged, flat_p, cfg, vol_sel=vol_sel[perm], n_octaves=octaves,
            dispatch_radius=True,
        )[inv]
    else:
        desc = compute_descriptors_all(
            merged, flat, cfg, vol_sel=vol_sel, n_octaves=octaves,
        )
    return desc.reshape(b, cap, 128)


def detect_and_describe_batch(
    images, cfg: SiftConfig | None = None, return_counts: bool = False
):
    """Batched detect+describe: (B, H, W[, C]) -> Keypoints with leading B.

    ``return_counts``: also return a dict of true per-stage counts (device
    arrays, shape (B,)) for capacity-overflow checks: any count exceeding the
    matching capacity means lanes were clipped and capacities must be raised.
    """
    cfg = cfg or SiftConfig()
    imgs = jnp.asarray(images, cfg.dtype)
    if imgs.ndim == 3:
        # (B, H, W) grayscale: make the channel explicit so the shape-generic
        # pyramid (no vmap) can't mistake the batch dim for (H, W, C).
        imgs = imgs[..., None]
    h, w = imgs.shape[1], imgs.shape[2]
    scale = 2 if cfg.double_image_size else 1
    octaves = cfg.octaves_count(w * scale, h * scale)

    if _use_front(cfg):
        gmr, dmr, masks, counts = _jit_front_twin_batch(imgs, cfg, octaves)
        kp, off0, (n_ext, n_ref, n_active) = _jit_detect_refine_counts_mr(
            masks, counts, dmr, cfg
        )
        # The front kernels emit the unit view natively (rows_u set); the
        # explicit relayout program only remains for layouts without it.
        mr = gmr if gmr.rows_u is not None else _jit_attach_units(gmr)
    else:
        gaussians, dogs = _jit_pyramids_batch(imgs, cfg, octaves)
        kp, off0, (n_ext, n_ref, n_active) = _jit_detect_refine_batch(dogs, cfg)
        mr = _jit_gauss_rows_batch(gaussians)
    if jnp.dtype(cfg.dtype) == jnp.float64:
        kp = _host_exact_sizes_mixed(kp, off0, cfg)
    cand, n_cand, ori_slots_max = _jit_orient_batch(mr, kp, cfg)
    allkp = _jit_dedup_compact_batch(cand, cfg.ori_cap)
    desc = _jit_desc_all_batch(mr, allkp, cfg)
    out = dataclasses.replace(allkp, desc=desc)
    if return_counts:
        return out, dict(
            extrema=n_ext, refined=n_ref, oriented=n_cand,
            refine_active=n_active,
            # > ORI_CAND_SLOTS means a keypoint's orientation candidates
            # were clipped (capacity honesty, like the other counts).
            ori_slots_max=ori_slots_max,
        )
    return out


def detect_and_describe(image, cfg: SiftConfig | None = None) -> Keypoints:
    """Detect SIFT keypoints + descriptors for one image.

    ``image``: (H, W) or (H, W, C) array in [0, 255] (float or uint8).
    Returns a fixed-capacity Keypoints buffer (device arrays) with a validity
    mask; ``.to_numpy()`` gives the dense host view.  Runs the fused
    production path as a batch of one.
    """
    cfg = cfg or SiftConfig()
    img = jnp.asarray(image, cfg.dtype)
    out = detect_and_describe_batch(img[None], cfg)
    return jax.tree.map(lambda a: a[0], out)


@partial(jax.jit, static_argnums=(1, 2))
def _detect_jit(img, cfg: SiftConfig, octaves: int) -> Keypoints:
    return detect_fn(img, cfg, octaves)


# --- per-octave staged path: the f64 bit-parity profile and stage-level
# debugging view (mirrors the stage boundaries of src/sift.cpp:712-776).
# Production throughput lives in the fused path above. ---


@jax.jit
def _jit_attach_units(mr):
    from sift_tpu.ops.gather import attach_row_units_batched

    return attach_row_units_batched(mr)


@partial(jax.jit, static_argnums=(1, 2))
def _jit_pyramids_batch(imgs, cfg: SiftConfig, octaves: int):
    """Natively batched pyramids: every op is (B, ...)-shape-generic, so no
    vmap is involved and the Pallas blur grids over the batch axis."""
    return build_pyramids(compute_initial_image(imgs, cfg), cfg, octaves)


@partial(jax.jit, static_argnums=(1, 2))
def _jit_pyramids(img, cfg: SiftConfig, octaves: int):
    initial = compute_initial_image(img, cfg)
    gaussians, dogs = build_pyramids(initial, cfg, octaves)
    return initial, gaussians, dogs


@partial(jax.jit, static_argnums=(1, 2))
def _jit_octave_extrema(dog, cfg: SiftConfig, octave: int):
    return detect_octave_extrema(
        dog, cfg.extremum_threshold(), cfg.extrema_cap_for_octave(octave),
        cfg.window_size,
    )


@partial(jax.jit, static_argnums=(3, 4))
def _jit_octave_refine(dog, zyx, valid, cfg: SiftConfig, octave: int):
    kp, off0 = refine_octave_keypoints(dog, zyx, valid, octave, cfg)
    return kputil.compact(kp, cfg.kp_cap_for_octave(octave), extra=off0)


@partial(jax.jit, static_argnums=(2, 3))
def _jit_octave_orient(gauss, kp, cfg: SiftConfig, octave: int):
    cand = orient_octave_keypoints(gauss, kp, octave, cfg)
    return kputil.compact(cand, 2 * cfg.kp_cap_for_octave(octave))


@partial(jax.jit, static_argnums=(1,))
def _jit_dedup(allkp, ori_cap: int):
    return kputil.compact(kputil.sort_and_dedup(allkp), ori_cap)


@partial(jax.jit, static_argnums=(2, 3))
def _jit_octave_descriptors(gauss, allkp, cfg: SiftConfig, octave: int):
    n = allkp.capacity
    sel = allkp.valid & (allkp.octave == octave)
    cap_o = 2 * cfg.kp_cap_for_octave(octave)
    idx_c, in_range = compact_mask(sel, cap_o)
    idx = jnp.where(in_range, idx_c, n)
    sub = jax.tree.map(lambda a: jnp.take(a, idx_c, axis=0), allkp)
    sub = dataclasses.replace(sub, valid=sub.valid & in_range)
    desc = compute_octave_descriptors(gauss, sub, octave, cfg)
    return allkp.desc.at[idx].set(desc, mode="drop")


def _host_exact_sizes_mixed(kp: Keypoints, off0, cfg: SiftConfig) -> Keypoints:
    """Host glibc-pow size recompute for a mixed-octave buffer (f64 parity).

    Same fix as _host_exact_sizes but per-lane octave (fused path); handles
    any leading batch dims.
    """
    import math

    from sift_tpu.utils.native import pow2_glibc

    size = np.asarray(kp.size).copy()
    layer = np.asarray(kp.layer).astype(np.float64)
    off = np.asarray(off0).astype(np.float64)
    oct_ = np.asarray(kp.octave).astype(np.float64)
    valid = np.asarray(kp.valid)
    # init_sigma * 2^octave: exact in f64 (exponent shift), same value as the
    # reference's init_sigma * pow(2, octave).
    scale = cfg.init_sigma * np.power(2.0, oct_)
    t = (layer + off) / float(cfg.intervals)
    p = pow2_glibc(t.reshape(-1))
    if p is not None:
        size = np.where(valid, scale * p.reshape(t.shape), size)
    else:
        flat_s, flat_t = size.reshape(-1), t.reshape(-1)
        sc = scale.reshape(-1)
        for i in np.nonzero(valid.reshape(-1))[0]:
            flat_s[i] = sc[i] * math.pow(2, float(flat_t[i]))
        size = flat_s.reshape(size.shape)
    return dataclasses.replace(kp, size=jnp.asarray(size))


def _host_exact_sizes(kp: Keypoints, off0, octave: int, cfg: SiftConfig) -> Keypoints:
    """Recompute kp.size with glibc pow for bit-parity (src/sift.cpp:427-429).

    XLA's exp2 deviates from glibc pow(2, x) by 1 ulp on ~30% of inputs; the
    f64 parity profile fixes sizes on the host.  Identical math otherwise.
    """
    import math

    from sift_tpu.utils.native import pow2_glibc

    size = np.asarray(kp.size).copy()
    layer = np.asarray(kp.layer).astype(np.float64)
    off = np.asarray(off0).astype(np.float64)
    valid = np.asarray(kp.valid)
    scale = cfg.init_sigma * math.pow(2, octave)
    t = (layer + off) / float(cfg.intervals)
    p = pow2_glibc(t)  # vectorized libm pow(2, .), bit-equal to math.pow
    if p is not None:
        size = np.where(valid, scale * p, size)
    else:
        for i in np.nonzero(valid)[0]:
            size[i] = scale * math.pow(2, float(t[i]))
    return dataclasses.replace(kp, size=jnp.asarray(size))


def detect_stages(img, cfg: SiftConfig, octaves: int) -> dict:
    """Debug/parity view: every pipeline stage for one image.

    Runs stage-by-stage through individually jitted (and persistently cached)
    helpers.  Mirrors the stage boundaries of src/sift.cpp:712-776.
    """
    initial, gaussians, dogs = _jit_pyramids(img, cfg, octaves)
    out = dict(initial=initial, gaussians=gaussians, dogs=dogs,
               extrema=[], refined=[], oriented=[])
    parity = jnp.dtype(cfg.dtype) == jnp.float64
    for o in range(octaves):
        zyx, valid = _jit_octave_extrema(dogs[o], cfg, o)
        out["extrema"].append((zyx, valid))
        kp, off0 = _jit_octave_refine(dogs[o], zyx, valid, cfg, o)
        if parity:
            kp = _host_exact_sizes(kp, off0, o, cfg)
        out["refined"].append(kp)
        out["oriented"].append(_jit_octave_orient(gaussians[o], kp, cfg, o))
    allkp = _jit_dedup(kputil.concatenate(out["oriented"]), cfg.ori_cap)
    desc_all = allkp.desc
    for o in range(octaves):
        desc_all = _jit_octave_descriptors(
            gaussians[o], dataclasses.replace(allkp, desc=desc_all), cfg, o
        )
    out["final"] = dataclasses.replace(allkp, desc=desc_all)
    return out
