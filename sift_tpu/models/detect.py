"""DoG extrema detection and sub-pixel Newton refinement.

TPU-native rebuild of:
  - is_extremum / detect_octave_extrema (src/sift.cpp:227-319): the scalar
    26-neighbor scan becomes a fused 3x3x3 min/max-pool comparison over the
    whole DoG volume, followed by masked compaction to a static capacity.
  - compute_keypoints (src/sift.cpp:330-436): the per-extremum <=5-step Newton
    loop becomes 5 masked batched steps over the capacity buffer (the
    reference's per-extremum deep octave copies, src/sift.cpp:346, disappear
    entirely).

All math follows the reference's exact expression ordering so the f64 parity
profile is bit-faithful; cube values are /255 like get_pixel_cube
(src/sift.cpp:39).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

import numpy as np

from sift_tpu.config import SiftConfig
from sift_tpu.ops.gather import (
    build_block_rows,
    build_multi_rows,
    compact_mask,
    CubeRows,
    gather_cubes,
    gather_cubes_multi,
    gather_cubes_packed,
    lut,
)
from sift_tpu.utils.keypoints import Keypoints
from sift_tpu.utils.numerics import round_half_away, xdiv


def extremum_mask(
    dog: jnp.ndarray, threshold: float, window_size: int = 3
) -> jnp.ndarray:
    """Boolean 26-neighbor extremum mask over the interior of a (D, H, W)
    DoG stack (shape (D-2b, H-2b, W-2b)).

    Matches src/sift.cpp:227-291: a pixel is an extremum if it is >= all
    window neighbors or <= all of them (ties allowed), and |pixel| > threshold
    (threshold compare at src/sift.cpp:279 skips |p| <= thr).  The window
    min/max is computed as three separable shift-reductions, which XLA maps
    onto plain VPU ops (measured faster than reduce_window on v5e).
    """
    w = window_size
    b = w // 2

    def pool1(a, axis, op):
        out = None
        for u in range(-b, b + 1):
            sl = [slice(None)] * 3
            sl[axis] = slice(u + b, a.shape[axis] + u - b)
            piece = a[tuple(sl)]
            out = piece if out is None else op(out, piece)
        return out

    wmax = pool1(pool1(pool1(dog, 2, jnp.maximum), 1, jnp.maximum), 0, jnp.maximum)
    wmin = pool1(pool1(pool1(dog, 2, jnp.minimum), 1, jnp.minimum), 0, jnp.minimum)
    center = dog[b:-b, b:-b, b:-b]
    return (jnp.abs(center) > threshold) & ((center >= wmax) | (center <= wmin))


def detect_octave_extrema(
    dog: jnp.ndarray, threshold: float, cap: int, window_size: int = 3
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Find 26-neighbor extrema of a (D, H, W) DoG stack.

    Returns (zyx (cap, 3) int32, valid (cap,) bool) in ascending
    (z, y, x)-lexicographic order.
    """
    b = window_size // 2
    is_ext = extremum_mask(dog, threshold, window_size)
    idx, valid = compact_mask(is_ext.reshape(-1), cap)
    d2, h2, w2 = is_ext.shape
    z = idx // (h2 * w2)
    y = (idx // w2) % h2
    x = idx % w2
    zyx = jnp.stack([z + b, y + b, x + b], axis=-1).astype(jnp.int32)
    return zyx, valid


def _gather_cubes(dog_rows, zyx: jnp.ndarray) -> jnp.ndarray:
    """(N, 3, 3, 3) cubes (axes dz, dy, dx), values / 255 (src/sift.cpp:39).

    ``dog_rows``: BlockRows layout of the DoG stack (ops/gather.py) — row
    gathers + one-hot extraction replace the scalar-gather slow path of
    vmapped dynamic_slice (153 ms -> 20 ms for 8192 cubes, batch 8).
    """
    cubes = gather_cubes(dog_rows, zyx)
    return xdiv(cubes, 255.0)


def _gradient(c: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(dz, dx, dy) central differences (src/sift.cpp:49-55)."""
    g0 = 0.5 * (c[:, 2, 1, 1] - c[:, 0, 1, 1])
    g1 = 0.5 * (c[:, 1, 1, 2] - c[:, 1, 1, 0])
    g2 = 0.5 * (c[:, 1, 2, 1] - c[:, 1, 0, 1])
    return g0, g1, g2


def _hessian(c: jnp.ndarray):
    """Symmetric 3x3 Hessian entries (src/sift.cpp:60-80); axis order (z,x,y)."""
    ctr = c[:, 1, 1, 1]
    h00 = c[:, 0, 1, 1] - 2 * ctr + c[:, 2, 1, 1]
    h11 = c[:, 1, 1, 0] - 2 * ctr + c[:, 1, 1, 2]
    h22 = c[:, 1, 0, 1] - 2 * ctr + c[:, 1, 2, 1]
    h01 = 0.25 * (c[:, 2, 1, 2] - c[:, 2, 1, 0] - c[:, 0, 1, 2] + c[:, 0, 1, 0])
    h02 = 0.25 * (c[:, 2, 2, 1] - c[:, 2, 0, 1] - c[:, 0, 2, 1] + c[:, 0, 0, 1])
    h12 = 0.25 * (c[:, 1, 0, 0] - c[:, 1, 0, 2] - c[:, 1, 2, 0] + c[:, 1, 2, 2])
    return h00, h11, h22, h01, h02, h12


def _fit_quadratic(g, h):
    """offset = -H^{-1} g via the adjugate, exact order of src/sift.cpp:86-106.

    No singularity guard, like the reference: det == 0 yields inf/nan offsets
    which fail the convergence test and end in rejection.
    """
    g0, g1, g2 = g
    h00, h11, h22, h01, h02, h12 = h
    det = (
        h00 * h11 * h22
        + 2 * (h01 * h12 * h02)
        - h02 * h11 * h02
        - h00 * h12 * h12
        - h01 * h01 * h22
    )
    i00 = (h11 * h22 - h12 * h12) / det
    i01 = (h02 * h12 - h01 * h22) / det
    i02 = (h01 * h12 - h02 * h11) / det
    i11 = (h00 * h22 - h02 * h02) / det
    i12 = (h02 * h01 - h00 * h12) / det
    i22 = (h00 * h11 - h01 * h01) / det
    o0 = -i00 * g0 - i01 * g1 - i02 * g2
    o1 = -i01 * g0 - i11 * g1 - i12 * g2
    o2 = -i02 * g0 - i12 * g1 - i22 * g2
    return o0, o1, o2


# Block width of the DoG MultiRows used by the fused Newton refinement.
# Cube windows are 3 wide, so any blk >= 2 is correct; this only trades
# row-gather width (DMA efficiency) against traffic.  Measured on the real
# chip (scripts/probe_refine_ab.py, batch 8, tight caps, two-phase):
# blk=32 -> 72.3 ms, blk=64 -> 66.3 ms, blk=128 -> 87.4 ms.
_REFINE_BLK = 64


def refine_active_cap_default(n: int) -> int:
    """Default phase-2 Newton buffer size for an n-lane extrema buffer.

    Shared with bench.py's capacity-honesty assertion so the two can't
    drift (measured: ~30-45% of extrema stay active after step 1)."""
    return max(128, n // 2)


def refine_cascade_caps(cfg: SiftConfig, n: int) -> tuple[tuple[int, int], ...]:
    """The Newton phase schedule: ((cap, steps), ...) after the full step 1.

    Measured on the CAVE-01 pair at cap 6144 (scripts/ probes): ~24% of
    valid extrema are still moving after step 1, ~12% after step 2, and the
    remainder (~8%, mostly oscillating lanes that never converge) walk all 5
    steps — so the cascade compacts twice: steps {2} at n//4 lanes and steps
    {3,4,5} at n//8, cutting gathered lanes ~2x vs the old single n//2
    phase.  A legacy ``cfg.refine_active_cap`` pins the old two-phase
    schedule.  Shared with bench.py/cli.py overflow assertions.
    """
    if cfg.refine_active_cap:
        return ((cfg.refine_active_cap, 4),)
    return ((max(128, n // 4), 1), (max(128, n // 8), 3))


def _newton_init(zyx, valid, dtype):
    n = zyx.shape[0]
    zero = jnp.zeros((n,), dtype)
    return dict(
        pos=zyx,
        active=valid,
        converged=jnp.zeros((n,), bool),
        g=(zero, zero, zero),
        h=(zero, zero, zero, zero, zero, zero),
        off=(zero, zero, zero),
        center=zero,
    )


def _newton_refine(
    cube_fn, zyx, valid, h_lane, w_lane, depth, border, dtype,
    steps: int = 5, state: dict | None = None,
):
    """Shared Newton core: masked steps + contrast/edge inputs.

    ``cube_fn(pos) -> (N, 3, 3, 3)`` cubes (already /255); ``h_lane`` /
    ``w_lane`` are per-lane image dims (scalars broadcast fine).  Returns the
    final state dict (pos, converged, g, h, off, center).  ``state`` resumes
    from a previous call's state (the two-phase split below); each step is a
    per-lane no-op for inactive lanes, so splitting 5 steps into 1 + 4 over
    any subset containing all still-active lanes is exact.
    """
    if state is None:
        state = _newton_init(zyx, valid, dtype)
    n = state["pos"].shape[0]

    def step(st):
        cubes = cube_fn(st["pos"])
        g = _gradient(cubes)
        h = _hessian(cubes)
        off = _fit_quadratic(g, h)
        max_off = jnp.maximum(
            jnp.abs(off[0]), jnp.maximum(jnp.abs(off[1]), jnp.abs(off[2]))
        )
        conv_now = st["active"] & (max_off < 0.5)  # CONVERGENCE_THR (sift.hh:8)

        def sel(mask, new, old):
            return jax.tree.map(lambda a, b: jnp.where(mask, a, b), new, old)

        st_g = sel(conv_now, g, st["g"])
        st_h = sel(conv_now, h, st["h"])
        st_off = sel(conv_now, off, st["off"])
        st_center = jnp.where(conv_now, cubes[:, 1, 1, 1], st["center"])

        moving = st["active"] & ~conv_now
        dz = round_half_away(off[0]).astype(jnp.int32)
        dx = round_half_away(off[1]).astype(jnp.int32)
        dy = round_half_away(off[2]).astype(jnp.int32)
        newpos = st["pos"] + jnp.stack([dz, dy, dx], axis=-1)
        z, y, x = newpos[:, 0], newpos[:, 1], newpos[:, 2]
        in_bounds = (
            (x >= border) & (x < w_lane - border)
            & (y >= border) & (y < h_lane - border)
            & (z >= border) & (z < depth - border)
        )
        pos = jnp.where(moving[:, None], newpos, st["pos"])
        # moving lanes that left bounds are rejected (src/sift.cpp:405-410);
        # clamp their positions so later gathers stay in range.
        lo = jnp.asarray([border, border, border], jnp.int32)
        hi = jnp.stack(
            [
                jnp.broadcast_to(jnp.asarray(depth - 1 - border, jnp.int32), (n,)),
                jnp.broadcast_to(h_lane - 1 - border, (n,)).astype(jnp.int32),
                jnp.broadcast_to(w_lane - 1 - border, (n,)).astype(jnp.int32),
            ],
            axis=-1,
        )
        pos = jnp.clip(pos, lo, hi)
        return dict(
            pos=pos,
            active=moving & in_bounds,
            converged=st["converged"] | conv_now,
            g=st_g,
            h=st_h,
            off=st_off,
            center=st_center,
        )

    # Up to MAX_CONVERGENCE_STEPS=5 total across phases (src/sift.hh:7);
    # fori_loop keeps the compiled graph one step deep instead of unrolled.
    return jax.lax.fori_loop(0, steps, lambda _, st: step(st), state)


def _accept_and_emit(state, octave_scale, oct_id, cfg, dtype, n):
    """Contrast + edge tests and keypoint emission (src/sift.cpp:365-429)."""
    g0, g1, g2 = state["g"]
    o0, o1, o2 = state["off"]
    h00, h11, h22, h01, h02, h12 = state["h"]

    # Contrast test (src/sift.cpp:365-378)
    dot_go = g0 * o0 + g1 * o1 + g2 * o2
    interp = state["center"] + 0.5 * dot_go
    valid_contrast = (jnp.abs(interp) * cfg.intervals) >= cfg.contrast_threshold

    # Edge test on the spatial 2x2 Hessian (src/sift.cpp:380-396);
    # reference indices [1][1]=dxx, [2][2]=dyy, [1][2]=dxy.
    tr = h11 + h22
    det2 = h11 * h22 - h12 * h12
    not_edge = (tr > 0) & ((tr * tr * cfg.eigen_ratio) < (
        (cfg.eigen_ratio + 1) * (cfg.eigen_ratio + 1) * det2
    ))

    accept = state["converged"] & valid_contrast & not_edge

    z = state["pos"][:, 0]
    y = state["pos"][:, 1]
    x = state["pos"][:, 2]
    fx = octave_scale * (x.astype(dtype) + o1)
    fy = octave_scale * (y.astype(dtype) + o2)
    # C++: init_sigma * 2^octave * pow(2, (layer + offset_z) / intervals)
    # (src/sift.cpp:427-429); glibc pow(2, x) and XLA exp2 are both
    # correctly rounded for this range, verified against the oracle in tests.
    size = (cfg.init_sigma * octave_scale) * jnp.exp2(
        xdiv(z.astype(dtype) + o0, float(cfg.intervals))
    )

    kp = Keypoints(
        x=fx,
        y=fy,
        octave=oct_id,
        layer=z.astype(jnp.int32),
        size=size,
        pori=jnp.zeros((n,), dtype),
        desc=jnp.zeros((n, 128), jnp.uint8),
        valid=accept,
    )
    return kp, o0


def refine_octave_keypoints(
    dog: jnp.ndarray,
    zyx: jnp.ndarray,
    valid: jnp.ndarray,
    octave: int,
    cfg: SiftConfig,
) -> tuple[Keypoints, jnp.ndarray]:
    """Batched Newton refinement + contrast/edge tests (src/sift.cpp:330-436).

    Returns (keypoints, layer_offset): keypoints in *initial* (possibly
    doubled) image coordinates with pori = 0, plus the converged layer offset
    (offset[0]) per lane — the f64 parity path recomputes kp.size on the host
    with glibc pow because XLA's exp2 is occasionally 1 ulp off glibc's.
    """
    depth, height, width = dog.shape
    border = cfg.window_size // 2
    dtype = dog.dtype
    n = zyx.shape[0]
    dog_rows = build_block_rows(dog)

    state = _newton_refine(
        lambda pos: _gather_cubes(dog_rows, pos),
        zyx, valid, height, width, depth, border, dtype,
    )
    octave_scale = float(math.pow(2, octave))
    return _accept_and_emit(
        state, octave_scale, jnp.full((n,), octave, jnp.int32), cfg, dtype, n
    )


# --- fused-front path: masks + per-128-block popcounts come from the Pallas
# octave kernel (ops/pallas_pyramid.fused_octave_front), so the global
# compaction runs off tiny count vectors instead of re-reading the DoG
# volume and boolean mask through HBM. ---


def octave_front_xla(
    img: jnp.ndarray, half_kernels, threshold: float, window_size: int = 3
):
    """XLA equivalent of fused_octave_front for octaves the kernel can't
    take (VMEM overflow on very wide images) and non-TPU backends.

    ``img``: (B, H, W) seed.  Returns (gauss (B, S, H, W), dogs, mask
    (B, S-3, H, nbm*128) f32, counts (B, S-3, H, nbm) int32) in exactly the
    kernel's layout (mask border rows/cols zero, lanes >= W zero).
    """
    from sift_tpu.ops.blur import separable_blur

    layers = [img]
    for hk in half_kernels:
        layers.append(separable_blur(layers[-1], hk))
    g = jnp.stack(layers, axis=-3)
    dogs = (
        jax.lax.slice_in_dim(g, 1, g.shape[-3], axis=-3)
        - jax.lax.slice_in_dim(g, 0, g.shape[-3] - 1, axis=-3)
    )
    h, w = img.shape[-2], img.shape[-1]
    nbm = -(-w // 128)
    m = jax.vmap(lambda d: extremum_mask(d, threshold, window_size))(dogs)
    b = window_size // 2
    mask = jnp.pad(
        m.astype(img.dtype),
        ((0, 0), (0, 0), (b, h - m.shape[2] - b), (b, nbm * 128 - m.shape[3] - b)),
    )
    counts = jnp.sum(
        mask.reshape(mask.shape[0], mask.shape[1], h, nbm, 128),
        axis=-1, dtype=jnp.int32,
    )
    return g, dogs, mask, counts


def extrema_from_counts(
    masks: list[jnp.ndarray],
    counts: list[jnp.ndarray],
    cap: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Counts-assisted global extrema compaction (batched, B leading).

    ``masks[o]``: (B, n_int, H_o, nbm_o * 128) f32 0/1 from the octave front;
    ``counts[o]``: (B, n_int, H_o, nbm_o) int32 per-128-lane-block popcounts.
    Returns (oct_id (B, cap), zyx (B, cap, 3), valid (B, cap), total (B,))
    in (octave, z, y, x)-lexicographic order — identical lane-for-lane to
    detect_extrema_all on the same masks.

    The k-th set bit is located with the same two-level compare-reduce +
    row-gather scheme as ops.gather.compact_mask, but over the precomputed
    128-lane-block counts (a ~40k-entry vector per image) instead of a
    multi-megabyte boolean volume.
    """
    bsz = counts[0].shape[0]
    n_int = counts[0].shape[1]
    hs = [c.shape[2] for c in counts]
    nbms = [c.shape[3] for c in counts]
    sizes = [n_int * h * nbm for h, nbm in zip(hs, nbms)]
    rbases = np.cumsum([0] + sizes).tolist()
    r_total = rbases[-1]

    flat = jnp.concatenate([c.reshape(bsz, -1) for c in counts], axis=1)
    csum = jnp.cumsum(flat, axis=1, dtype=jnp.int32)  # inclusive, (B, R)
    total = csum[:, -1]

    k = jnp.arange(cap, dtype=jnp.int32)
    ns = -(-r_total // 128)
    big = jnp.iinfo(jnp.int32).max
    csum2 = jnp.full((bsz, ns * 128), big, jnp.int32)
    csum2 = jax.lax.dynamic_update_slice(csum2, csum, (0, 0))
    csum2 = csum2.reshape(bsz, ns, 128)
    sup_last = csum2[:, :, -1]  # (B, ns)
    le_s = sup_last[:, None, :] <= k[None, :, None]  # (B, cap, ns)
    sup = jnp.sum(le_s, axis=2).astype(jnp.int32)
    supc = jnp.minimum(sup, ns - 1)
    win = jnp.take_along_axis(csum2, supc[:, :, None], axis=1)  # (B, cap, 128)
    le_w = win <= k[None, :, None]
    row = sup * 128 + jnp.sum(le_w, axis=2).astype(jnp.int32)
    base = jnp.maximum(
        jnp.max(jnp.where(le_w, win, 0), axis=2),
        jnp.max(jnp.where(le_s, sup_last[:, None, :], 0), axis=2),
    )
    rowc = jnp.minimum(row, r_total - 1)
    rank = k[None, :] - base  # (B, cap) 0-based rank within the mask row

    mrows = jnp.concatenate(
        [m.reshape(bsz, -1, 128) for m in masks], axis=1
    )  # (B, R, 128)
    g = jnp.take_along_axis(
        mrows, rowc[:, :, None], axis=1
    )  # (B, cap, 128) row gather — the fast path
    lanes = jnp.arange(128, dtype=jnp.int32)
    tri = (lanes[:, None] <= lanes[None, :]).astype(jnp.float32)
    pref = jnp.einsum(
        "bkl,lm->bkm", g.astype(jnp.float32), tri,
        precision=jax.lax.Precision.HIGHEST,
    )
    hit = (g > 0) & (pref == (rank[:, :, None] + 1).astype(jnp.float32))
    lane = jnp.argmax(hit, axis=2).astype(jnp.int32)

    oct_id = jnp.zeros(rowc.shape, jnp.int32)
    for o in range(1, len(counts)):
        oct_id = oct_id + (rowc >= rbases[o]).astype(jnp.int32)
    local = rowc - lut(rbases[:-1], oct_id, jnp.int32)
    nbm_l = lut(nbms, oct_id, jnp.int32)
    h_l = lut(hs, oct_id, jnp.int32)
    bblk = local % nbm_l
    y = (local // nbm_l) % h_l
    z = local // (nbm_l * h_l) + 1  # interior layers start at z = 1
    x = bblk * 128 + lane
    zyx = jnp.stack([z, y, x], axis=-1).astype(jnp.int32)
    valid = k[None, :] < total[:, None]
    return oct_id, zyx, valid, total


# --- cross-octave fused path: every octave's extrema/refinement in ONE
# program over global capacity buffers.  Removes the per-octave program
# floor (~15-25 ms/octave of mask+compact+dispatch even for tiny octaves)
# that dominated the stage-wise pipeline on small octaves. ---


def detect_extrema_all(
    dogs: list[jnp.ndarray], threshold: float, cap: int, window_size: int = 3
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Extrema of ALL octaves compacted into one global capacity buffer.

    Returns (oct_id (cap,), zyx (cap, 3), valid (cap,), total int32) in
    (octave, z, y, x)-lexicographic order — the same relative order as the
    per-octave path concatenated, so downstream dedup picks identical
    representatives.  ``total`` is the true extremum count for overflow
    detection (total > cap means the capacity clipped real extrema).
    """
    b = window_size // 2
    masks = [extremum_mask(d, threshold, window_size) for d in dogs]
    flats = [m.reshape(-1) for m in masks]
    sizes = [int(f.shape[0]) for f in flats]
    offs = np.cumsum([0] + sizes).tolist()
    flat = jnp.concatenate(flats)
    total = jnp.sum(flat, dtype=jnp.int32)
    idx, valid = compact_mask(flat, cap)
    oct_id = jnp.zeros(idx.shape, jnp.int32)
    for o in range(1, len(dogs)):
        oct_id = oct_id + (idx >= offs[o]).astype(jnp.int32)
    local = idx - lut(offs[:-1], oct_id, jnp.int32)
    h2 = lut([m.shape[1] for m in masks], oct_id, jnp.int32)
    w2 = lut([m.shape[2] for m in masks], oct_id, jnp.int32)
    z = local // (h2 * w2)
    y = (local // w2) % h2
    x = local % w2
    zyx = jnp.stack([z + b, y + b, x + b], axis=-1).astype(jnp.int32)
    return oct_id, zyx, valid, total


def refine_keypoints_all(
    dogs: list[jnp.ndarray] | None,
    oct_id: jnp.ndarray,
    zyx: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: SiftConfig,
    mr=None,
) -> tuple[Keypoints, jnp.ndarray, jnp.ndarray]:
    """Newton refinement for a mixed-octave extrema buffer (fused path).

    Identical math to refine_octave_keypoints lane-for-lane; per-octave
    constants (dims, 2^octave) become per-lane table lookups.

    ``dogs`` may be None when ``mr`` (the DoG MultiRows gather space) is
    given — the twin-front path never materializes plain DoG stacks, and
    everything needed here (per-octave dims, dtype) lives in ``mr``.

    Cascade schedule (refine_cascade_caps): step 1 runs on every lane, then
    before each phase the still-moving lanes (a fast-shrinking minority on
    real images) are compacted into a smaller buffer — exact because a step
    is a per-lane no-op once the lane converged or left bounds, and a lane
    entering a phase carries only (pos, active): its g/h/off/center are
    written at convergence time only.  Returns (keypoints, off0, n_active)
    where ``n_active`` is the (P,)-vector of true still-moving counts
    entering each phase, for overflow detection against the phase caps.
    """
    border = cfg.window_size // 2
    n = zyx.shape[0]
    if mr is None:
        mr = build_multi_rows(dogs, blk=_REFINE_BLK)
    shapes = mr.shapes if dogs is None else [d.shape for d in dogs]
    depth = shapes[0][0]
    dtype = mr.rows.dtype if dogs is None else dogs[0].dtype
    h_tbl = [s[1] for s in shapes]
    w_tbl = [s[2] for s in shapes]
    n_oct = len(shapes)

    if isinstance(mr, CubeRows):
        def cube(oid):
            return lambda pos: xdiv(gather_cubes_packed(mr, oid, pos), 255.0)
    else:
        def cube(oid):
            return lambda pos: xdiv(gather_cubes_multi(mr, oid, pos), 255.0)

    def fields(st):
        return jnp.stack(
            [*st["g"], *st["h"], *st["off"], st["center"],
             st["converged"].astype(dtype)],
            axis=1,
        )

    state = _newton_refine(
        cube(oct_id), zyx, valid,
        lut(h_tbl, oct_id, jnp.int32), lut(w_tbl, oct_id, jnp.int32),
        depth, border, dtype, steps=1,
    )

    cur_state, cur_oct = state, oct_id
    n_active = []
    levels = []  # (idx, sel, parent_state, parent_lanes)
    for cap_i, nsteps in refine_cascade_caps(cfg, n):
        n_active.append(jnp.sum(cur_state["active"], dtype=jnp.int32))
        cur_n = cur_state["pos"].shape[0]
        if cap_i >= cur_n:
            cur_state = _newton_refine(
                cube(cur_oct), None, None,
                lut(h_tbl, cur_oct, jnp.int32), lut(w_tbl, cur_oct, jnp.int32),
                depth, border, dtype, steps=nsteps, state=cur_state,
            )
            continue
        idx, sel = compact_mask(cur_state["active"], cap_i)
        packed = jnp.concatenate([cur_state["pos"], cur_oct[:, None]], axis=1)
        sub = jnp.take(packed, idx, axis=0)
        sub_pos, sub_oct = sub[:, :3], sub[:, 3]
        levels.append((idx, sel, cur_state, cur_n))
        cur_state = _newton_refine(
            cube(sub_oct), sub_pos, sel,
            lut(h_tbl, sub_oct, jnp.int32), lut(w_tbl, sub_oct, jnp.int32),
            depth, border, dtype, steps=nsteps,
        )
        cur_oct = sub_oct

    # Unwind: scatter each phase's lanes back into its parent buffer.
    for idx, sel, parent, parent_n in reversed(levels):
        widx = jnp.where(sel, idx, parent_n)
        pos = parent["pos"].at[widx].set(cur_state["pos"], mode="drop")
        merged = fields(parent).at[widx].set(fields(cur_state), mode="drop")
        cur_state = dict(
            pos=pos,
            active=parent["active"],
            converged=merged[:, 13] > 0.5,
            g=(merged[:, 0], merged[:, 1], merged[:, 2]),
            h=tuple(merged[:, 3 + i] for i in range(6)),
            off=(merged[:, 9], merged[:, 10], merged[:, 11]),
            center=merged[:, 12],
        )
    state = cur_state

    octave_scale = lut(
        [float(math.pow(2, o)) for o in range(n_oct)], oct_id, dtype
    )
    kp, off0 = _accept_and_emit(state, octave_scale, oct_id, cfg, dtype, n)
    return kp, off0, jnp.stack(n_active)
