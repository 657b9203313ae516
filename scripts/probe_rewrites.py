"""On-chip A/B probes for the round-2 gather/compaction rewrites.

Measures (amortized, D2H-fenced) the current slow formulations against the
proposed TPU-fast ones on realistic shapes (CAVE pair, B=8, octave 0).
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/.cache/jax_tpu_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sift_tpu import SiftConfig
from sift_tpu.models import sift as S
from sift_tpu.utils.io import load_image

cave = "/root/reference/stitching/collection/Dataset/CAVE-01_atrium"
img1 = load_image(f"{cave}/00.jpg")
img2 = load_image(f"{cave}/01.jpg")
cfg = SiftConfig()
B = 8
imgs = jnp.asarray(np.stack([img1, img2] * (B // 2)).astype(np.float32))
octaves = cfg.octaves_count(1280, 960)
gaussians, dogs = S._jit_pyramids_batch(imgs, cfg, octaves)
dog0, gauss0 = dogs[0], gaussians[0]
D, H, W = dog0.shape[1:]
print("dog0", dog0.shape)


def fence(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def timeit(name, fn, reps=5, k=4):
    fence(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn()
        fence(out)
        ts.append((time.perf_counter() - t0) / k)
    print(f"{name:48s} {statistics.median(ts)*1e3:9.2f} ms")
    return fn()


thr = cfg.extremum_threshold()
cap = cfg.extrema_cap_for_octave(0)

# ---------------- extremum mask: reduce_window vs separable shifts ---------
def mask_rw(dog):
    wmax = jax.lax.reduce_window(dog, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "VALID")
    wmin = jax.lax.reduce_window(dog, jnp.inf, jax.lax.min, (3, 3, 3), (1, 1, 1), "VALID")
    c = dog[1:-1, 1:-1, 1:-1]
    return (jnp.abs(c) > thr) & ((c >= wmax) | (c <= wmin))


def mask_sep(dog):
    def pool1(a, axis, op):
        sl = [slice(None)] * 3
        sl[axis] = slice(0, -2)
        lo = a[tuple(sl)]
        sl[axis] = slice(1, -1)
        mid = a[tuple(sl)]
        sl[axis] = slice(2, None)
        hi = a[tuple(sl)]
        return op(op(lo, mid), hi)

    wmax = pool1(pool1(pool1(dog, 2, jnp.maximum), 1, jnp.maximum), 0, jnp.maximum)
    wmin = pool1(pool1(pool1(dog, 2, jnp.minimum), 1, jnp.minimum), 0, jnp.minimum)
    c = dog[1:-1, 1:-1, 1:-1]
    return (jnp.abs(c) > thr) & ((c >= wmax) | (c <= wmin))


f_rw = jax.jit(jax.vmap(mask_rw))
f_sep = jax.jit(jax.vmap(mask_sep))
m1 = timeit("mask reduce_window", lambda: f_rw(dog0))
m2 = timeit("mask separable shifts", lambda: f_sep(dog0))
print("  masks equal:", bool(jnp.all(m1 == m2)))

# ---------------- compaction: nonzero vs cumsum+searchsorted ---------------
def compact_nonzero(mask):
    flat = mask.reshape(-1)
    n = flat.shape[0]
    idx = jnp.nonzero(flat, size=cap, fill_value=n)[0]
    return idx, idx < n


def compact_css(mask):
    flat = mask.reshape(-1)
    n = flat.shape[0]
    c = jnp.cumsum(flat.astype(jnp.int32))
    k = jnp.arange(1, cap + 1, dtype=jnp.int32)
    idx = jnp.searchsorted(c, k, side="left").astype(jnp.int32)
    valid = k <= c[-1]
    return jnp.where(valid, idx, n), valid


def compact_rows(mask):
    # two-stage: per-row counts -> block search -> in-row rank via iota compare
    flat = mask.reshape(-1)
    n = flat.shape[0]
    RW = 1024
    nr = -(-n // RW)
    pad = nr * RW - n
    m2d = jnp.concatenate([flat, jnp.zeros((pad,), bool)]).reshape(nr, RW)
    cnt = jnp.sum(m2d, axis=1, dtype=jnp.int32)
    csum = jnp.cumsum(cnt)  # inclusive, (nr,)
    k = jnp.arange(cap, dtype=jnp.int32)
    row = jnp.searchsorted(csum, k, side="right").astype(jnp.int32)  # block of k-th bit
    rowc = jnp.minimum(row, nr - 1)
    base = jnp.where(row > 0, csum[jnp.maximum(row - 1, 0)], 0)
    rank = k - base  # 0-based rank within row
    rows = m2d[rowc]  # (cap, RW) row gather
    pref = jnp.cumsum(rows.astype(jnp.int32), axis=1)
    hit = rows & (pref == (rank[:, None] + 1))
    inrow = jnp.argmax(hit, axis=1)
    idx = rowc * RW + inrow
    valid = k < csum[-1]
    return jnp.where(valid, idx, n), valid


f_nz = jax.jit(jax.vmap(compact_nonzero))
f_css = jax.jit(jax.vmap(compact_css))
f_rows = jax.jit(jax.vmap(compact_rows))
r1 = timeit("compact nonzero (6M mask)", lambda: f_nz(m1))
r2 = timeit("compact cumsum+searchsorted", lambda: f_css(m1))
r3 = timeit("compact two-stage rows", lambda: f_rows(m1))
i1, v1 = map(np.asarray, r1)
i2, v2 = map(np.asarray, r2)
i3, v3 = map(np.asarray, r3)
print("  css equal:", bool((v1 == v2).all() and (i1[v1] == i2[v2]).all()))
print("  rows equal:", bool((v1 == v3).all() and (i1[v1] == i3[v3]).all()))

# small-mask case (orient compact: 147k lanes)
small = jnp.zeros((B, 147456), bool).at[:, ::37].set(True)
cap_s = 8192

def sc_nz(m):
    idx = jnp.nonzero(m, size=cap_s, fill_value=m.shape[0])[0]
    return idx, idx < m.shape[0]

def sc_css(m):
    n = m.shape[0]
    c = jnp.cumsum(m.astype(jnp.int32))
    k = jnp.arange(1, cap_s + 1, dtype=jnp.int32)
    idx = jnp.searchsorted(c, k, side="left").astype(jnp.int32)
    valid = k <= c[-1]
    return jnp.where(valid, idx, n), valid

def sc_rows(m):
    n = m.shape[0]
    RW = 1024
    nr = -(-n // RW)
    pad = nr * RW - n
    m2d = jnp.concatenate([m, jnp.zeros((pad,), bool)]).reshape(nr, RW)
    cnt = jnp.sum(m2d, axis=1, dtype=jnp.int32)
    csum = jnp.cumsum(cnt)
    k = jnp.arange(cap_s, dtype=jnp.int32)
    row = jnp.searchsorted(csum, k, side="right").astype(jnp.int32)
    rowc = jnp.minimum(row, nr - 1)
    base = jnp.where(row > 0, csum[jnp.maximum(row - 1, 0)], 0)
    rank = k - base
    rows = m2d[rowc]
    pref = jnp.cumsum(rows.astype(jnp.int32), axis=1)
    hit = rows & (pref == (rank[:, None] + 1))
    inrow = jnp.argmax(hit, axis=1)
    idx = rowc * RW + inrow
    valid = k < csum[-1]
    return jnp.where(valid, idx, n), valid


f_snz = jax.jit(jax.vmap(sc_nz))
f_scss = jax.jit(jax.vmap(sc_css))
f_srows = jax.jit(jax.vmap(sc_rows))
s1 = timeit("small compact nonzero (147k)", lambda: f_snz(small))
timeit("small compact css (147k)", lambda: f_scss(small))
s3 = timeit("small compact rows (147k)", lambda: f_srows(small))
si1, sv1 = map(np.asarray, s1)
si3, sv3 = map(np.asarray, s3)
print("  small rows equal:", bool((sv1 == sv3).all() and (si1[sv1] == si3[sv3]).all()))

# ---------------- cube gather: dynamic_slice vs block rows -----------------
from sift_tpu.models.detect import detect_octave_extrema

f_ext = jax.jit(jax.vmap(lambda d: detect_octave_extrema(d, thr, cap, 3)))
zyx, valid = f_ext(dog0)


def cubes_ds(dog, zyx):
    def one(p):
        return jax.lax.dynamic_slice(dog, (p[0] - 1, p[1] - 1, p[2] - 1), (3, 3, 3))
    return jax.vmap(one)(zyx)


BLK = 128
nb = -(-(W + 2) // BLK)  # blocks over a (W+2)-padded x axis


def make_rows(dog):
    # overlap layout: block b covers cols [b*BLK, b*BLK + 2*BLK)
    p = jnp.pad(dog, ((0, 0), (0, 0), (0, nb * BLK + BLK - W)))
    a = p.reshape(D, H, nb + 1, BLK)
    twin = jnp.concatenate([a[:, :, :-1], a[:, :, 1:]], axis=-1)  # (D,H,nb,2BLK)
    return twin.reshape(D * H * nb, 2 * BLK)


def cubes_rows(rows, zyx):
    z, y, x = zyx[:, 0], zyx[:, 1], zyx[:, 2]
    b = jnp.clip((x - 1) // BLK, 0, nb - 1)
    ox = x - 1 - b * BLK  # in [0, BLK)
    dz = jnp.arange(-1, 2)
    dy = jnp.arange(-1, 2)
    ridx = (
        (z[:, None, None] + dz[None, :, None]) * H
        + (y[:, None, None] + dy[None, None, :])
    ) * nb + b[:, None, None]
    ridx = ridx.reshape(-1)
    g = rows[ridx].reshape(-1, 9, 2 * BLK)  # (N, 9, 2BLK)
    # one-hot extract 3 cols at ox..ox+2
    lanes = jnp.arange(2 * BLK)
    oh = (lanes[None, :, None] == (ox[:, None, None] + jnp.arange(3)[None, None, :])).astype(g.dtype)
    cube = jnp.einsum("nrl,nlc->nrc", g, oh, precision=jax.lax.Precision.HIGHEST)
    return cube.reshape(-1, 3, 3, 3)


f_cds = jax.jit(jax.vmap(cubes_ds, in_axes=(0, 0)))
f_mk = jax.jit(jax.vmap(make_rows))
rows0 = f_mk(dog0)
f_crw = jax.jit(jax.vmap(cubes_rows, in_axes=(0, 0)))
c1 = timeit("cube gather dynamic_slice (8192)", lambda: f_cds(dog0, zyx))
timeit("cube rows build", lambda: f_mk(dog0))
c2 = timeit("cube gather block rows (8192)", lambda: f_crw(rows0, zyx))
print("  cubes equal:", bool(jnp.all(c1 == c2)))

# ---------------- patch gather: dynamic_slice vs block rows ----------------
from sift_tpu.models.orient import ori_radius_bound


# Local copies of the retired slow-path baselines this probe A/Bs against
# (they used to live in models/orient.py before the block-rows rewrite).
def pad_stack(g, r):
    return jnp.pad(g, ((0, 0), (r + 1, r + 1), (r + 1, r + 1)))


def gather_patches(padded, lay, yy, xx, r):
    pp = 2 * r + 3

    def one(l, y, x):
        return jax.lax.dynamic_slice(padded, (l, y, x), (1, pp, pp))[0]

    return jax.vmap(one)(lay, yy, xx)

r_max = ori_radius_bound(cfg)
p = 2 * r_max + 3
g1i = gauss0[:, :, :, :]
Sd = gauss0.shape[1]
NKP = 4096
rng = np.random.default_rng(0)
lay = jnp.asarray(rng.integers(0, Sd, NKP), jnp.int32)
yy = jnp.asarray(rng.integers(0, H, NKP), jnp.int32)
xx = jnp.asarray(rng.integers(0, W, NKP), jnp.int32)

f_pad = jax.jit(jax.vmap(lambda g: pad_stack(g, r_max)))
padded = f_pad(gauss0)
f_gp = jax.jit(jax.vmap(gather_patches, in_axes=(0, None, None, None, None)), static_argnums=(4,))

Hp, Wp = padded.shape[2], padded.shape[3]
nbp = -(-Wp // BLK)


def make_prow(pad_):
    q = jnp.pad(pad_, ((0, 0), (0, 0), (0, nbp * BLK + BLK - Wp)))
    a = q.reshape(Sd, Hp, nbp + 1, BLK)
    twin = jnp.concatenate([a[:, :, :-1], a[:, :, 1:]], axis=-1)
    return twin.reshape(Sd * Hp * nbp, 2 * BLK)


def patches_rows(prow, lay, yy, xx):
    # patch[a,b] = padded[lay, yy+a, xx+b] for a,b in [0,p)
    b = jnp.clip(xx // BLK, 0, nbp - 1)
    ox = xx - b * BLK
    aa = jnp.arange(p)
    ridx = ((lay[:, None] * Hp + yy[:, None] + aa[None, :]) * nbp + b[:, None]).reshape(-1)
    g = prow[ridx].reshape(-1, p, 2 * BLK)
    lanes = jnp.arange(2 * BLK)
    oh = (lanes[None, :, None] == (ox[:, None, None] + jnp.arange(p)[None, None, :])).astype(g.dtype)
    return jnp.einsum("nrl,nlc->nrc", g, oh, precision=jax.lax.Precision.HIGHEST)


f_mkp = jax.jit(jax.vmap(make_prow))
prow = f_mkp(padded)
f_prw = jax.jit(jax.vmap(patches_rows, in_axes=(0, None, None, None)))
p1 = timeit(f"patch gather dyn_slice {NKP}x{p}x{p}", lambda: f_gp(padded, lay, yy, xx, r_max))
timeit("patch rows build", lambda: f_mkp(padded))
p2 = timeit(f"patch gather block rows {NKP}x{p}x{p}", lambda: f_prw(prow, lay, yy, xx))
print("  patches equal:", bool(jnp.all(p1 == p2)))
