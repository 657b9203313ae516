"""Pallas streaming builder for the twin-block row layout (ops/gather.py).

The XLA construction of BlockRows (pad -> reshape -> concat twins) costs
~11 ms for the batched gaussian stacks on v5e — XLA materializes the
interleaved concat through HBM at well below stream rate.  This kernel
reads each row strip once and writes the nb twin blocks with static lane
slices, all in VMEM: (R, (nb+1)*blk) -> (R, nb, 2*blk).

Pure data movement (no arithmetic), so bit-exactness is trivial; the f64
parity profile keeps the XLA path (Mosaic kernels are f32-only here).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _twin_kernel(in_ref, out_ref, *, nb, blk):
    x = in_ref[:]  # (strip, (nb + 1) * blk)
    for b in range(nb):
        out_ref[:, b, :] = x[:, b * blk : (b + 2) * blk]


def twin_rows_2d(
    mat: jnp.ndarray, blk: int, interpret: bool | None = None
) -> jnp.ndarray:
    """(R, W) -> (R * nb, 2 * blk) twin-block rows (zero-padded past W).

    Row r block b holds columns [b * blk, (b + 2) * blk) of ``mat``; output
    row index is r * nb + b — identical to the XLA construction in
    gather.build_block_rows.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r, w = mat.shape
    nb = -(-w // blk)
    wp = (nb + 1) * blk
    mat = jnp.pad(mat, ((0, 0), (0, wp - w)))
    strip = 256
    while strip * wp * 4 * 4 > 12 * 1024 * 1024 and strip > 8:
        strip //= 2
    grid = (-(-r // strip),)
    out = pl.pallas_call(
        partial(_twin_kernel, nb=nb, blk=blk),
        grid=grid,
        in_specs=[pl.BlockSpec((strip, wp), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((strip, nb, 2 * blk), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((r, nb, 2 * blk), mat.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(mat)
    return out.reshape(r * nb, 2 * blk)


def twin_fits(mat_shape, dtype) -> bool:
    return jnp.dtype(dtype) == jnp.float32


# --- strip-interleaved twin rows, written straight into ONE shared buffer ---
#
# The row-major twin layout needs a per-octave kernel output followed by an
# XLA concat into the global gather space (~9.5 ms per relayout at batch 16:
# a full read+write of the 2x-inflated rows), plus a materialized jnp.pad of
# every volume to feed the kernel.  Interleaving rows at STRIP granularity —
# strips of ``st`` (power of two) consecutive image rows, each strip's nb
# twin blocks stored back to back — makes every grid step's output a single
# CONTIGUOUS (nb * st, 2 * blk) block of the global buffer, so per-octave
# kernels write into it in place via input_output_aliases and the concat
# disappears; the input block is the raw full-width strip (lane padding
# happens in-register inside the kernel, so the jnp.pad copy disappears
# too).  Row of (flat image row r, block b) is
#
#   bases[o] + (((r >> ls) * nb + b) << ls) + (r & (st - 1)),   ls = log2 st
#
# (see gather.MultiRows.shp — pure shifts/masks per gather lane).  Rows in
# the per-octave strip padding (r >= S * H_o within the last strip) and in
# the inter-octave alignment gaps are UNDEFINED — gathers never touch them
# (row indices are always < S * H_o and clamped).


def _twin_strips_kernel(x_ref, buf_ref, out_ref, *, nb, blk, st, w):
    x = x_ref[:]  # (st, w) raw strip (rows past R are Pallas OOB padding)
    wp = (nb + 1) * blk
    if wp > w:
        x = jnp.concatenate([x, jnp.zeros((st, wp - w), x.dtype)], axis=1)
    for b in range(nb):
        out_ref[b * st : (b + 1) * st, :] = x[:, b * blk : (b + 2) * blk]


def _twin_strips_write(f, buf, base, blk, st, nb, rpad, interpret):
    """Write octave rows ``f`` (B, R, W) into ``buf`` (B, RT, 2 * blk) in
    place, strip-interleaved at ``base`` (must be a multiple of nb * st)."""
    bsz, _, w = f.shape
    return pl.pallas_call(
        partial(_twin_strips_kernel, nb=nb, blk=blk, st=st, w=w),
        grid=(bsz, rpad // st),
        in_specs=[
            pl.BlockSpec((None, st, w), lambda bi, s: (bi, s, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (None, nb * st, 2 * blk),
            lambda bi, s: (bi, base // (nb * st) + s, 0),
        ),
        out_shape=jax.ShapeDtypeStruct(buf.shape, buf.dtype),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(f, buf)


def _pick_strip(r: int, nb: int, blk: int) -> int:
    """Rows per grid step: biggest power of two keeping the in+out blocks
    within ~8 MB of VMEM (x2 for double buffering) and the last-strip row
    padding bounded for small volumes."""
    st = 1024
    while st > 8 and (
        st * blk * 4 * (3 * nb + 1) > 8 * 1024 * 1024 or st >= 4 * max(8, r)
    ):
        st //= 2
    return st


def twin_rows_strips(
    vols_b, blk: int = 64, strip: int | None = None,
    interpret: bool | None = None,
):
    """Strip-interleaved twin gather space for (B, S, H_o, W_o) stacks.

    Returns a gather.MultiRows with ``shp`` set to the per-octave log2(strip)
    (see the layout comment above).  Row CONTENTS are identical to
    gather.build_multi_rows (pure data movement, bit-exact); only the row
    order differs.
    """
    from sift_tpu.ops.gather import MultiRows

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz = vols_b[0].shape[0]
    flat = [v.reshape(bsz, -1, v.shape[-1]) for v in vols_b]
    metas = []  # (nb, st, rpad, base)
    acc = 0
    for f in flat:
        r, w = f.shape[1], f.shape[2]
        nb = -(-w // blk)
        st = strip or _pick_strip(r, nb, blk)
        rpad = -(-r // st) * st
        unit = nb * st
        acc = -(-acc // unit) * unit  # base must be out-block-aligned
        metas.append((nb, st, rpad, acc))
        acc += nb * rpad
    buf = jnp.zeros((bsz, acc, 2 * blk), vols_b[0].dtype)
    for f, (nb, st, rpad, base) in zip(flat, metas):
        buf = _twin_strips_write(f, buf, base, blk, st, nb, rpad, interpret)
    return MultiRows(
        rows=buf,
        shapes=tuple(v.shape[-3:] for v in vols_b),
        blk=blk,
        nbs=tuple(m[0] for m in metas),
        bases=tuple(m[3] for m in metas),
        shp=tuple(m[1].bit_length() - 1 for m in metas),
    )


# --- cube-packed DoG rows (gather.CubeRows) ---------------------------------
#
# The XLA construction (gather.cube_rows_xla) reshapes through sw=25-lane
# minor tiles, which XLA materializes at ~5x below stream rate (~15 ms per
# batch-16 sweep).  This kernel reads each DoG row strip once and emits the
# 128-lane packed rows with static VMEM lane slices, like the twin builder
# above.  Pure data movement; row order identical to cube_rows_xla.


def _cube_pack_kernel(d_ref, out_ref, *, nbp, stride, sw, nz, st):
    x = d_ref[:]  # (nz, st, (nbp + 1) * stride) — lane 0 = image column -1
    dt = x.dtype
    pad = jnp.zeros((st, 128 - nz * sw), dt)
    for cb in range(nbp):
        pieces = [x[z, :, cb * stride : cb * stride + sw] for z in range(nz)]
        pieces.append(pad)
        out_ref[cb * st : (cb + 1) * st, :] = jnp.concatenate(pieces, axis=-1)


def cube_pack_rows(
    d: jnp.ndarray, strip: int = 64, interpret: bool | None = None
) -> jnp.ndarray:
    """(B, S, H, W) plain DoG stack -> (B, nstr * strip * nbp, 128) packed
    cube rows in the strip-block-major CubeRows order (ls = log2(strip)).

    Bit-identical output to gather.cube_rows_xla(d, strip) on rows covering
    image rows < H (rows past H hold padding that the cube gather never
    reads — interior y only; cube_rows_xla zero-fills them instead).
    """
    from sift_tpu.ops.gather import cube_rows_params

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert strip & (strip - 1) == 0, strip
    b, s, h, w = d.shape
    stride, sw, nbp = cube_rows_params(s, w)
    wp = (nbp + 1) * stride
    st = strip
    hp = -(-h // st) * st
    # Lane 0 = column -1 (the left halo of block 0); zero past W.
    dp = jnp.pad(d, ((0, 0), (0, 0), (0, hp - h), (1, wp - w - 1)))
    kernel = partial(
        _cube_pack_kernel, nbp=nbp, stride=stride, sw=sw, nz=s, st=st
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, hp // st),
        out_shape=jax.ShapeDtypeStruct((b, (hp // st) * nbp * st, 128), d.dtype),
        in_specs=[
            pl.BlockSpec((None, s, st, wp), lambda bi, si: (bi, 0, si, 0)),
        ],
        out_specs=pl.BlockSpec(
            (None, nbp * st, 128), lambda bi, si: (bi, si, 0)
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(dp)
    return out
