"""Fused multi-sigma octave blur: one Pallas kernel per octave.

The XLA pyramid runs 5 incremental blurs x 2 separable passes per octave,
each streaming the full image through HBM (plus 5 DoG subtract passes):
~25 HBM round trips per octave.  This kernel computes the whole octave —
five chained blurs (src/sift.cpp:161-174) and the five DoG differences
(src/sift.cpp:209-225) — inside VMEM over row strips: one strided read of
the seed layer, ten strip writes.

Strips overlap via ``pl.Element`` halo windows: a strip of S rows is
delivered with ``halo = sum_i radius_i`` extra rows on each side, enough for
the whole blur chain; rows outside the image (the Element padding region is
garbage) are replaced by replicas of the true border row after the seed load
and after every vertical pass, which reproduces the reference's
clamp-at-border semantics for every blur in the chain exactly
(src/image.cpp:174-181; the per-pixel ``sum_w`` renormalizer is a constant,
see ops/blur.py).

Accumulation order matches ops/blur.separable_blur tap for tap (horizontal
then vertical, ``acc = x*k0; acc += k_u*(x[+u] + x[-u]); acc /= sum_w``), so
remaining differences vs the XLA path are compiled FMA-contraction choices
(last ulp) — the same contract as ops/pallas_blur.  f32 fast profile only.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sift_tpu.config import half_kernel_weight_sum
from sift_tpu.ops.pallas_blur import _shift_clamped_tpu

_VMEM_BUDGET = 12 * 1024 * 1024


def _chain_halo(half_kernels: list[list[float]]) -> int:
    """Total vertical halo: the sum of the chained blur radii."""
    return sum(len(hk) - 1 for hk in half_kernels)


def pick_strip(w: int, halo: int, n_out: int, itemsize: int = 4) -> int | None:
    """Largest strip whose double-buffered blocks + temporaries fit VMEM."""
    for strip in (256, 128, 64, 32):
        ext = strip + 2 * halo
        est = itemsize * (2 * ext * w + 2 * n_out * strip * w + 6 * ext * w)
        if est <= _VMEM_BUDGET:
            return strip
    return None


def fused_octave_fits(shape, half_kernels, dtype=jnp.float32) -> bool:
    if jnp.dtype(dtype) != jnp.float32:
        return False
    w = shape[-1]
    halo = _chain_halo(half_kernels)
    return pick_strip(w, halo, 2 * len(half_kernels)) is not None


def _fix_borders(x, base, height):
    """Replace rows outside [0, height) with replicas of the border rows.

    ``base`` is the (traced) global image row of block row 0.  Replicas make
    every subsequent vertical tap read the clamped value without per-tap
    index logic; they must be refreshed after each vertical pass (a blurred
    replica is NOT the replica of the blurred border row).
    """
    ext = x.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, ext), 1) + base  # (1, ext)
    gidx = rows.reshape(ext, 1)
    # Mosaic has no dynamic_slice: extract the border rows as one-hot
    # row-vector contractions instead.  When the border row is outside this
    # block the mask is all-zero and the (zero) replica is never selected.
    top = ((rows == 0).astype(x.dtype) @ x)  # (1, w)
    bot = ((rows == height - 1).astype(x.dtype) @ x)
    x = jnp.where(gidx < 0, top, x)
    return jnp.where(gidx > height - 1, bot, x)


def _h_pass(x, taps, sum_w):
    """Horizontal pass with lane clamp at the true image width."""
    acc = x * taps[0]
    for u in range(1, len(taps)):
        acc = acc + taps[u] * (
            _shift_clamped_tpu(x, u, 1) + _shift_clamped_tpu(x, -u, 1)
        )
    return acc / jnp.asarray(sum_w, x.dtype)


def _v_pass(x, taps, sum_w):
    """Vertical pass as plain rolls: border replicas supply clamped values,
    and roll wraparound only lands in the (unused) decayed halo margin."""
    n = x.shape[0]
    acc = x * taps[0]
    for u in range(1, len(taps)):
        up = pltpu.roll(x, (n - u) % n, axis=0)  # x[i + u]
        dn = pltpu.roll(x, u, axis=0)  # x[i - u]
        acc = acc + taps[u] * (up + dn)
    return acc / jnp.asarray(sum_w, x.dtype)


def _octave_kernel(in_ref, *out_refs, taps_list, sum_ws, strip, halo, height):
    # (ext, W): strip rows + halo each side, read from the edge-padded seed
    # (already clamped-replica rows outside the image, so no initial fix).
    x = in_ref[:]
    base = pl.program_id(1) * strip - halo
    n_layers = len(taps_list)
    prev = x
    prev_strip = x[halo:halo + strip, :]
    for i in range(n_layers):
        h = _h_pass(prev, taps_list[i], sum_ws[i])
        v = _v_pass(h, taps_list[i], sum_ws[i])
        v = _fix_borders(v, base, height)
        g_strip = v[halo:halo + strip, :]
        out_refs[i][:] = g_strip
        # dog[i] = gauss[i+1] - gauss[i]  (src/sift.cpp:217)
        out_refs[n_layers + i][:] = g_strip - prev_strip
        prev = v
        prev_strip = g_strip


# --- fused octave FRONT: blur chain + DoG + extremum mask + popcounts ---
#
# The production detect path needs, per octave: the gaussian stack (for
# orientation/descriptors), the DoG stack (for Newton cubes), the 26-neighbor
# extremum mask, and per-128-lane-block popcounts of that mask (so the global
# extrema compaction can run off tiny count vectors instead of re-reading a
# 78 MB boolean volume).  All of these are functions of values this kernel
# already holds in VMEM, so emitting them here removes three full-pyramid HBM
# round trips (XLA mask pass, mask concat, popcount) plus the XLA stack
# copies of the per-layer blur outputs.


def _spatial3(d, op):
    """3x3 spatial min/max of a (strip+2, w) haloed strip -> (strip, w).

    x neighbors via clamped lane shifts (border columns are masked False
    downstream, so the clamp never changes a reported extremum); y neighbors
    from the +-1 halo rows.
    """
    m = op(op(_shift_clamped_tpu(d, 1, 1), d), _shift_clamped_tpu(d, -1, 1))
    return op(op(m[2:, :], m[1:-1, :]), m[:-2, :])


def _octave_front_kernel(
    in_ref, gauss_ref, dog_ref, mask_ref, counts_ref, *,
    taps_list, sum_ws, strip, halo, height, width, nbm, thr,
):
    x = in_ref[:]  # (ext, w): strip rows + halo each side (edge-padded seed)
    base = pl.program_id(1) * strip - halo
    n = len(taps_list)
    dtype = x.dtype
    gauss_ref[0] = x[halo:halo + strip, :]
    prev = x
    dogs_h = []  # (strip + 2, w) haloed DoG strips for the 3x3x3 window
    for i in range(n):
        h = _h_pass(prev, taps_list[i], sum_ws[i])
        v = _v_pass(h, taps_list[i], sum_ws[i])
        v = _fix_borders(v, base, height)
        gauss_ref[i + 1] = v[halo:halo + strip, :]
        d = v - prev  # dog[i] = gauss[i+1] - gauss[i] (src/sift.cpp:217)
        dog_ref[i] = d[halo:halo + strip, :]
        dogs_h.append(d[halo - 1:halo + strip + 1, :])
        prev = v

    # Extremum mask (src/sift.cpp:227-291): >= all 27 window values or <=
    # all of them (ties allowed; the window includes the center, which
    # compares equal) and |center| > threshold.  Border rows/columns are
    # excluded like the interior scan at src/sift.cpp:275-288.
    s3max = [_spatial3(d, jnp.maximum) for d in dogs_h]
    s3min = [_spatial3(d, jnp.minimum) for d in dogs_h]
    w = x.shape[1]
    grow = jax.lax.broadcasted_iota(jnp.int32, (strip, w), 0) + base + halo
    lane = jax.lax.broadcasted_iota(jnp.int32, (strip, w), 1)
    interior = (
        (lane >= 1) & (lane <= width - 2) & (grow >= 1) & (grow <= height - 2)
    )
    # Per-128-block popcount as a (strip, w) @ (w, nbm) 0/1 matmul: exact in
    # f32 (counts <= 128), stays off the scalar path.  The mask is emitted at
    # raw width w — the caller pads lanes to nbm * 128 (a no-op for the big
    # octaves, whose widths are already 128-aligned; Mosaic cannot lower the
    # in-kernel lane pad).
    bmat = (
        jax.lax.broadcasted_iota(jnp.int32, (w, nbm), 0) // 128
        == jax.lax.broadcasted_iota(jnp.int32, (w, nbm), 1)
    ).astype(dtype)
    thr_c = jnp.asarray(thr, dtype)
    for zi in range(1, n - 1):
        c = dogs_h[zi][1:-1, :]
        wmax = jnp.maximum(jnp.maximum(s3max[zi - 1], s3max[zi]), s3max[zi + 1])
        wmin = jnp.minimum(jnp.minimum(s3min[zi - 1], s3min[zi]), s3min[zi + 1])
        m = (jnp.abs(c) > thr_c) & ((c >= wmax) | (c <= wmin)) & interior
        mf = m.astype(dtype)
        mask_ref[zi - 1] = mf
        counts_ref[zi - 1] = jax.lax.dot(
            mf, bmat, precision=jax.lax.Precision.HIGHEST
        ).astype(jnp.int32)


def _front_halo(half_kernels: list[list[float]]) -> int:
    """Front-kernel halo: chain halo + 1 row of slack so the last DoG's
    +-1 strip-halo rows (read by the 3x3x3 extremum window) stay inside the
    blur chain's valid margin instead of touching roll-wraparound rows."""
    return _chain_halo(half_kernels) + 1


def pick_strip_front(
    w: int, halo: int, n: int, itemsize: int = 4
) -> int | None:
    """Largest strip for the front kernel (blocks + temporaries in VMEM)."""
    nbm = -(-w // 128)
    wpm = nbm * 128
    n_int = n - 2
    for strip in (128, 64, 32, 16, 8):
        ext = -(-(strip + 2 * halo) // 8) * 8
        out_rows = (n + 1) * w + n * w + n_int * wpm + n_int * nbm
        est = itemsize * (
            2 * ext * w          # input window, double buffered
            + 2 * strip * out_rows  # output blocks, double buffered
            + 6 * ext * w        # blur chain temporaries
            + n * (strip + 2) * w  # retained haloed DoG strips
            + 2 * n * strip * w  # spatial min/max strips
        )
        if est <= _VMEM_BUDGET:
            return strip
    return None


def fused_octave_front_fits(shape, half_kernels, dtype=jnp.float32) -> bool:
    if jnp.dtype(dtype) != jnp.float32:
        return False
    w = shape[-1]
    halo = _front_halo(half_kernels)
    return pick_strip_front(w, halo, len(half_kernels)) is not None


def fused_octave_front(
    img: jnp.ndarray,
    half_kernels: list[list[float]],
    threshold: float,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One octave, one kernel: seed (B, H, W) ->
    (gauss (B, S, H, W), dogs (B, S-1, H, W),
     mask (B, S-3, H, W) f32 0/1, counts (B, S-3, H, nbm) int32)

    ``gauss`` includes the seed as layer 0 (S = len(half_kernels) + 1); the
    mask covers the interior DoG layers (z in [1, S-3]) with border
    rows/columns forced 0, in full-image coordinates; ``counts[z, y, b]`` is
    the popcount of mask lanes [128 b, min(W, 128 (b+1))) of row (z, y).
    Callers pad mask lanes to nbm * 128 before extrema_from_counts (zero
    cost for 128-aligned widths).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    b, h, w = img.shape
    n = len(half_kernels)
    nbm = -(-w // 128)
    taps_list = tuple(tuple(float(t) for t in hk) for hk in half_kernels)
    sum_ws = tuple(half_kernel_weight_sum(list(hk)) for hk in half_kernels)
    halo = _front_halo(half_kernels)
    strip = pick_strip_front(w, halo, n, jnp.dtype(img.dtype).itemsize)
    assert strip is not None, (img.shape, "use fused_octave_front_fits first")
    strip = min(strip, max(32, -(-h // 8) * 8))
    nstrips = -(-h // strip)
    ext = strip + 2 * halo
    ext = -(-ext // 8) * 8
    pad_bot = (nstrips - 1) * strip + ext - halo - h
    img_pad = jnp.pad(img, ((0, 0), (halo, pad_bot), (0, 0)), mode="edge")

    kernel = partial(
        _octave_front_kernel, taps_list=taps_list, sum_ws=sum_ws, strip=strip,
        halo=halo, height=h, width=w, nbm=nbm, thr=float(threshold),
    )
    outs = pl.pallas_call(
        kernel,
        grid=(b, nstrips),
        out_shape=[
            jax.ShapeDtypeStruct((b, n + 1, h, w), img.dtype),
            jax.ShapeDtypeStruct((b, n, h, w), img.dtype),
            jax.ShapeDtypeStruct((b, n - 2, h, w), img.dtype),
            jax.ShapeDtypeStruct((b, n - 2, h, nbm), jnp.int32),
        ],
        in_specs=[
            pl.BlockSpec(
                (pl.Squeezed(), pl.Element(ext, (0, 0)), pl.Element(w, (0, 0))),
                lambda bi, s: (bi, s * strip, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=[
            pl.BlockSpec((None, n + 1, strip, w), lambda bi, s: (bi, 0, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n, strip, w), lambda bi, s: (bi, 0, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n - 2, strip, w),
                         lambda bi, s: (bi, 0, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n - 2, strip, nbm),
                         lambda bi, s: (bi, 0, s, 0), memory_space=pltpu.VMEM),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(img_pad)
    gauss, dogs, mask, counts = outs
    if squeeze:
        gauss, dogs, mask, counts = gauss[0], dogs[0], mask[0], counts[0]
    return gauss, dogs, mask, counts


# --- fused octave front emitting TWIN-ROW gather layouts directly ---
#
# The round-3 pipeline wrote plain gauss/DoG stacks from the front kernel and
# then re-read them through two relayout passes (gauss MultiRows ~10.4 ms per
# batch-8 sweep, plus the DoG twin relayout inside the detect stage).  Both
# relayouts are pure data movement over arrays this kernel already holds in
# VMEM, so it writes the twin-block rows itself and the plain stacks are
# never materialized:
#
#   gauss twins: stored layers [1, intervals] only (refined keypoint layers
#     always land there, see models/detect.py refine bounds), blk=64.
#   DoGs: cube-packed rows (gather.CubeRows strip-block-major order),
#     written straight into the shared pk buffer — the plain stacks never
#     exist; their only consumer is the Newton cube gather.
#   mask/counts: as fused_octave_front.
#   down:        plain gauss layer S-3 (the next octave's seed,
#     src/sift.cpp:195-196) — the only plain-layout output left.
#
# Twin rows are written STRIP-MAJOR / LAYER-MINOR so each grid step's output
# is one contiguous block of the shared gather buffer: row of (layer s, image
# row y, block b) is
#   base + ((((y >> ls) * nl + (s - l0)) * nb + b) << ls) + (y & (st - 1))
# (gather.MultiRows.nls layout; st = the kernel's own row strip, power of 2).
# Per-octave kernels write into ONE shared buffer per volume kind via
# input_output_aliases, like pallas_relayout.twin_rows_strips.


def _octave_front_twin_kernel(
    in_ref, *refs,
    taps_list, sum_ws, strip, halo, height, width, nbm, thr, blk, nbt,
    g_l0, g_nl, cstride, csw, cnbp, unit, have_gin, have_pin,
):
    # Aliased inputs (when present, in order): gbuf_in -> gt, pkbuf_in -> pk.
    # Create mode (first octave) omits them: the kernel's output IS the
    # fresh buffer — no aliased input, and crucially no XLA zeros-fill of
    # the ~800 MB batch-16 gather spaces (blocks outside this octave's
    # region stay undefined; gathers never index them — later octaves
    # alias-write their own regions).
    refs = refs[int(have_gin) + int(have_pin):]
    gt_ref, pk_ref, mask_ref, counts_ref, down_ref = refs
    x = in_ref[:]  # (ext, w): strip rows + halo each side (edge-padded seed)
    base = pl.program_id(1) * strip - halo
    n = len(taps_list)
    dtype = x.dtype
    w = x.shape[1]
    wpt = (nbt + 1) * blk

    def write_twins(ref, slot, v_strip):
        xt = v_strip
        if wpt > w:
            xt = jnp.concatenate(
                [xt, jnp.zeros((strip, wpt - w), dtype)], axis=1
            )
        for bb in range(nbt):
            tw = xt[:, bb * blk : (bb + 2) * blk]  # (strip, 2blk)
            if unit > 1:
                # Emit the u-row-unit view NATIVELY: u consecutive image
                # rows of one (strip, layer, block) group collapse into one
                # (u * 2blk)-lane row (pure data movement — the reshape is
                # the same sublane->lane relayout attach_row_units_batched
                # used to pay ~2 ms/sweep for in XLA).
                su = strip // unit
                ref[(slot * nbt + bb) * su : (slot * nbt + bb + 1) * su, :] = (
                    tw.reshape(su, unit * 2 * blk)
                )
            else:
                ref[
                    (slot * nbt + bb) * strip : (slot * nbt + bb + 1) * strip, :
                ] = tw

    # Mask plumbing (emitted layer-by-layer below; interleaving the extremum
    # window with the blur chain keeps only a SLIDING 3-layer window of
    # haloed DoGs / spatial min-max strips live, which is what lets the
    # strip be twice as tall in the same VMEM — the halo recompute overhead
    # scales with ext/strip, so taller strips directly cut blur work).
    grow = jax.lax.broadcasted_iota(jnp.int32, (strip, w), 0) + base + halo
    lane = jax.lax.broadcasted_iota(jnp.int32, (strip, w), 1)
    interior = (
        (lane >= 1) & (lane <= width - 2) & (grow >= 1) & (grow <= height - 2)
    )
    bmat = (
        jax.lax.broadcasted_iota(jnp.int32, (w, nbm), 0) // 128
        == jax.lax.broadcasted_iota(jnp.int32, (w, nbm), 1)
    ).astype(dtype)
    thr_c = jnp.asarray(thr, dtype)

    prev = x
    dogs_c = []  # center strips of every DoG layer (cube-packed below)
    win = []  # sliding [(center_rows, s3max, s3min)] of the last 3 DoGs
    for i in range(n):
        h = _h_pass(prev, taps_list[i], sum_ws[i])
        v = _v_pass(h, taps_list[i], sum_ws[i])
        v = _fix_borders(v, base, height)
        layer = i + 1  # gauss stack index (0 = seed)
        if g_l0 <= layer < g_l0 + g_nl:
            write_twins(gt_ref, layer - g_l0, v[halo:halo + strip, :])
        if layer == n - 2:  # gauss[S-3], S = n+1: the next octave's seed
            down_ref[...] = v[halo:halo + strip, :]
        d = v - prev  # dog[i] = gauss[i+1] - gauss[i] (src/sift.cpp:217)
        dogs_c.append(d[halo:halo + strip, :])
        dh = d[halo - 1:halo + strip + 1, :]
        win.append((dh[1:-1, :], _spatial3(dh, jnp.maximum),
                    _spatial3(dh, jnp.minimum)))
        if len(win) == 3:
            zi = i - 1  # interior DoG layer whose window is now complete
            c = win[1][0]
            wmax = jnp.maximum(jnp.maximum(win[0][1], win[1][1]), win[2][1])
            wmin = jnp.minimum(jnp.minimum(win[0][2], win[1][2]), win[2][2])
            m = (jnp.abs(c) > thr_c) & ((c >= wmax) | (c <= wmin)) & interior
            mf = m.astype(dtype)
            mask_ref[zi - 1] = mf
            counts_ref[zi - 1] = jax.lax.dot(
                mf, bmat, precision=jax.lax.Precision.HIGHEST
            ).astype(jnp.int32)
            win.pop(0)
        prev = v

    # Cube-packed DoG rows (gather.CubeRows): for each column block cb,
    # lanes pack every layer's stored window [cb*cstride - 1,
    # cb*cstride - 1 + csw) — built here from the VMEM-resident center
    # strips so the plain DoG stacks never exist (the packed rows are the
    # DoG's ONLY consumer, via the Newton cube gather).  Strip-block-major
    # row order (CubeRows ls = log2(strip)): this grid step's rows are ONE
    # contiguous block of the shared pk buffer, written per column block.
    right = (cnbp - 1) * cstride - 1 + csw
    zpadw = max(0, right - w)
    dpad = [
        jnp.concatenate(
            [jnp.zeros((strip, 1), dtype), dc]
            + ([jnp.zeros((strip, zpadw), dtype)] if zpadw else []),
            axis=1,
        )
        for dc in dogs_c
    ]
    lanepad = jnp.zeros((strip, 128 - n * csw), dtype)
    for cb in range(cnbp):
        pieces = [dp[:, cb * cstride : cb * cstride + csw] for dp in dpad]
        pk_ref[cb * strip : (cb + 1) * strip, :] = jnp.concatenate(
            pieces + [lanepad], axis=1
        )


def pick_strip_front_twin(
    w: int, halo: int, n: int, nl: int, blk: int, itemsize: int = 4
) -> int | None:
    """Largest power-of-two strip keeping the twin front kernel in VMEM.

    The estimate below over-counts real VMEM residency ~2.5-3x (it
    double-counts double-buffered outputs against blur temporaries, and
    Mosaic reuses dead buffers): strip 128 at the doubled-640x480 octave
    (est 39 MB) compiles and runs on the 16 MB chip, beats strip 32 by
    ~6 ms per batch-16 sweep (halo recompute is ext/strip), and keeps the
    oracle match set exactly.  The 40 MB budget is calibrated to that
    empirical fit; Mosaic rejects at compile (loudly, not silently) if a
    config really exceeds VMEM."""
    nbm = -(-w // 128)
    nbt = -(-w // blk)
    wpm = nbm * 128
    n_int = n - 2
    for strip in (256, 128, 64, 32, 16, 8):
        ext = -(-(strip + 2 * halo) // 8) * 8
        est = itemsize * (
            2 * ext * w                                # input, double buffered
            + 2 * strip * nl * nbt * 2 * blk           # gauss twins, x2
            + 2 * strip * -(-w // 20) * 128            # packed DoG out, x2
            + n * strip * w                            # DoG center strips
            + 2 * strip * (n_int * wpm + n_int * nbm + w)  # mask+counts+down
            + 6 * ext * w                              # blur temporaries
            + 3 * (strip + 2) * w                      # sliding haloed DoGs
            + 2 * 3 * strip * w                        # sliding spatial
        )
        if est <= 80 * 1024 * 1024:
            return strip
    return None


def front_twin_strip(shape, half_kernels, n_keep_gauss: int, blk: int = 64,
                     dtype=jnp.float32) -> int | None:
    """The strip the twin front kernel would use for this octave (None if it
    does not fit VMEM or the dtype is unsupported).  Shared with the caller,
    which must size the twin buffers with the same strip."""
    if jnp.dtype(dtype) != jnp.float32:
        return None
    h, w = shape[-2], shape[-1]
    halo = -(-_front_halo(half_kernels) // 8) * 8  # sublane-aligned (kernel)
    strip = pick_strip_front_twin(
        w, halo, len(half_kernels), n_keep_gauss, blk
    )
    if strip is None:
        return None
    hp2 = 1 << max(h - 1, 7).bit_length()  # smallest pow2 >= max(h, 8)
    return min(strip, max(32, hp2))


def fused_octave_front_twin(
    img: jnp.ndarray,
    half_kernels: list[list[float]],
    threshold: float,
    gbuf: jnp.ndarray,
    gbase: int,
    strip: int,
    blk: int = 64,
    g_l0: int = 1,
    g_nl: int | None = None,
    interpret: bool | None = None,
    unit: int = 1,
    pkbuf: jnp.ndarray | jax.ShapeDtypeStruct | None = None,
    pkbase: int = 0,
):
    """One octave, one kernel: gauss twin rows + cube-packed DoG rows, both
    written in place into shared gather buffers.

    img: (B, H, W) seed.  Writes gauss twin rows (stored layers
    [g_l0, g_l0 + g_nl)) into ``gbuf`` at row ``gbase``
    (strip-major/layer-minor layout, base block-aligned) and the
    cube-packed DoG rows (gather.CubeRows strip-block-major order,
    ls = log2(strip); rows past H are padding the cube gather never reads)
    into ``pkbuf`` at row ``pkbase`` (must be nbp*strip-aligned).  Returns
    ``(gbuf, pkbuf, mask, counts, down)``; mask/counts are as
    fused_octave_front and ``down`` is the plain gauss layer S-3.

    Either buffer given as a ShapeDtypeStruct = CREATE mode: the kernel's
    output IS the fresh buffer (no aliased input, no XLA zeros-fill of the
    ~800 MB batch-16 gather spaces); an array = alias mode.  ``pkbuf``
    None = standalone mode: a fresh per-octave pk buffer
    (B, nstrips * nbp * strip, 128) is created.

    ``unit`` > 1: ``gbuf`` is the u-row-unit VIEW of the twin layout —
    shape (B, G // u, u * 2 * blk), row i holding twin rows
    [i * u, (i + 1) * u) — and ``gbase`` stays in TWIN-ROW units (must be
    divisible by u).  Same bytes as unit == 1 + an XLA reshape; emitting
    the unit view natively deletes the per-sweep relayout copy
    (gather.attach_row_units_batched).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w = img.shape
    n = len(half_kernels)
    if g_nl is None:
        g_nl = n - 2  # layers [1, intervals]
    assert strip % unit == 0 and gbase % max(unit, 1) == 0, (strip, unit, gbase)
    nbm = -(-w // 128)
    nbt = -(-w // blk)
    taps_list = tuple(tuple(float(t) for t in hk) for hk in half_kernels)
    sum_ws = tuple(half_kernel_weight_sum(list(hk)) for hk in half_kernels)
    # Halo rounded up to the sublane tile (8): the in-kernel strip slices
    # v[halo : halo + strip] must sit at sublane offset 0 or Mosaic rejects
    # the lane-pad concatenate ("result/input offset mismatch"); the extra
    # rows are ordinary valid margin.
    halo = -(-_front_halo(half_kernels) // 8) * 8
    nstrips = -(-h // strip)
    ext = strip + 2 * halo
    pad_bot = (nstrips - 1) * strip + ext - halo - h
    img_pad = jnp.pad(img, ((0, 0), (halo, pad_bot), (0, 0)), mode="edge")

    g_unit = g_nl * nbt * strip  # gauss twin rows per grid step
    assert gbase % g_unit == 0, gbase

    from sift_tpu.ops.gather import cube_rows_params

    cstride, csw, cnbp = cube_rows_params(n, w)
    pk_unit = cnbp * strip  # packed cube rows per grid step
    if pkbuf is None:
        pkbuf = jax.ShapeDtypeStruct((b, nstrips * pk_unit, 128), img.dtype)
        assert pkbase == 0, pkbase
    assert pkbase % pk_unit == 0, (pkbase, pk_unit)
    g_create = isinstance(gbuf, jax.ShapeDtypeStruct)
    pk_create = isinstance(pkbuf, jax.ShapeDtypeStruct)
    kernel = partial(
        _octave_front_twin_kernel, taps_list=taps_list, sum_ws=sum_ws,
        strip=strip, halo=halo, height=h, width=w, nbm=nbm,
        thr=float(threshold), blk=blk, nbt=nbt, g_l0=g_l0, g_nl=g_nl,
        cstride=cstride, csw=csw, cnbp=cnbp, unit=unit,
        have_gin=not g_create, have_pin=not pk_create,
    )
    in_specs = [
        pl.BlockSpec(
            (pl.Squeezed(), pl.Element(ext, (0, 0)), pl.Element(w, (0, 0))),
            lambda bi, s: (bi, s * strip, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [img_pad]
    aliases = {}
    if not g_create:
        aliases[len(operands)] = 0
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(gbuf)
    if not pk_create:
        aliases[len(operands)] = 1
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(pkbuf)
    outs = pl.pallas_call(
        kernel,
        grid=(b, nstrips),
        out_shape=[
            jax.ShapeDtypeStruct(gbuf.shape, gbuf.dtype),
            jax.ShapeDtypeStruct(pkbuf.shape, pkbuf.dtype),
            jax.ShapeDtypeStruct((b, n - 2, h, w), img.dtype),
            jax.ShapeDtypeStruct((b, n - 2, h, nbm), jnp.int32),
            jax.ShapeDtypeStruct((b, h, w), img.dtype),
        ],
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (None, g_unit // unit, unit * 2 * blk),
                lambda bi, s, gb=gbase // g_unit: (bi, gb + s, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, pk_unit, 128),
                lambda bi, s, pb=pkbase // pk_unit: (bi, pb + s, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((None, n - 2, strip, w),
                         lambda bi, s: (bi, 0, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n - 2, strip, nbm),
                         lambda bi, s: (bi, 0, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, strip, w), lambda bi, s: (bi, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    gbuf, pk, mask, counts, down = outs
    return gbuf, pk, mask, counts, down


def twin_strided_xla(
    vol_b: jnp.ndarray, blk: int, st: int, l0: int = 0, nl: int | None = None
) -> jnp.ndarray:
    """XLA constructor of the strip-major/layer-minor twin layout.

    (B, S, H, W) -> (B, nstrips * nl * nb * st, 2 * blk) keeping layers
    [l0, l0 + nl).  Row contents identical to the kernel's (pure data
    movement); used for octaves the kernel can't take and for tests.
    """
    b, s, h, w = vol_b.shape
    if nl is None:
        nl = s - l0
    nb = -(-w // blk)
    nstrips = -(-h // st)
    v = vol_b[:, l0:l0 + nl]
    v = jnp.pad(
        v, ((0, 0), (0, 0), (0, nstrips * st - h), (0, (nb + 1) * blk - w))
    )
    a = v.reshape(b, nl, nstrips, st, nb + 1, blk)
    twin = jnp.concatenate([a[..., :-1, :], a[..., 1:, :]], axis=-1)
    t = twin.transpose(0, 2, 1, 4, 3, 5)  # (b, nstrips, nl, nb, st, 2blk)
    return t.reshape(b, nstrips * nl * nb * st, 2 * blk)


def fused_octave_blur(
    img: jnp.ndarray,
    half_kernels: list[list[float]],
    interpret: bool | None = None,
) -> tuple[list[jnp.ndarray], list[jnp.ndarray]]:
    """One octave in one kernel: seed (B, H, W) or (H, W) -> (gauss, dogs).

    ``half_kernels`` are the chained blur half-kernels (cfg kernels[1:]);
    returns ``gauss`` = [blur_1(seed), blur_2(...), ...] (len N) and
    ``dogs`` = [gauss[0] - seed, gauss[1] - gauss[0], ...] (len N).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    b, h, w = img.shape
    n = len(half_kernels)
    taps_list = tuple(tuple(float(t) for t in hk) for hk in half_kernels)
    sum_ws = tuple(half_kernel_weight_sum(list(hk)) for hk in half_kernels)
    halo = _chain_halo(half_kernels)
    strip = pick_strip(w, halo, 2 * n, jnp.dtype(img.dtype).itemsize)
    assert strip is not None, (img.shape, "use fused_octave_fits first")
    # Clamp the strip to the octave height, rounded up to the sublane tile
    # (8) so the Element window offset s*strip stays provably tile-aligned.
    strip = min(strip, max(32, -(-h // 8) * 8))
    nstrips = -(-h // strip)
    ext = strip + 2 * halo
    # Mosaic requires the sublane (second-to-last) block dim divisible by 8:
    # round the haloed strip up; the extra rows are in-bounds neighbors (mid
    # strips) or clamped replicas (last strip) and never reach an output
    # block.  The axon AOT compiler rejects Element low/high padding, so the
    # seed is edge-padded in HBM instead — every window read is in-bounds,
    # and the replica rows ARE the reference's clamp-at-border seed values.
    ext = -(-ext // 8) * 8
    pad_bot = (nstrips - 1) * strip + ext - halo - h
    img_pad = jnp.pad(img, ((0, 0), (halo, pad_bot), (0, 0)), mode="edge")

    kernel = partial(
        _octave_kernel, taps_list=taps_list, sum_ws=sum_ws, strip=strip,
        halo=halo, height=h,
    )
    out_spec = pl.BlockSpec((None, strip, w), lambda bi, s: (bi, s, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(b, nstrips),
        out_shape=[jax.ShapeDtypeStruct((b, h, w), img.dtype)] * (2 * n),
        in_specs=[
            pl.BlockSpec(
                (pl.Squeezed(), pl.Element(ext, (0, 0)), pl.Element(w, (0, 0))),
                lambda bi, s: (bi, s * strip, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=[out_spec] * (2 * n),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(img_pad)
    if squeeze:
        outs = [o[0] for o in outs]
    return list(outs[:n]), list(outs[n:])
