"""Seam-aware compositing: global offsets, gain compensation, multiband
blending, overlap-consistency metric."""

from __future__ import annotations

import numpy as np

from sift_tpu.models.blend import (
    estimate_gains,
    multiband_blend,
    overlap_consistency,
    solve_global_offsets,
)
from sift_tpu.models.stitch import _canvas_layout


def _smooth_texture(rng, h, w):
    """Low-frequency random texture (naive separable box smoothing)."""
    t = rng.uniform(30, 220, (h, w, 3)).astype(np.float32)
    k = 9
    ker = np.ones(k) / k
    for axis in (0, 1):
        t = np.apply_along_axis(
            lambda v: np.convolve(v, ker, mode="same"), axis, t
        )
    return t.astype(np.float32)


def _pair():
    rng = np.random.default_rng(0)
    tex = _smooth_texture(rng, 200, 320)
    a = tex[:160, :200].copy()
    b = tex[40:, 120:].copy()
    ha = np.eye(3)
    hb = np.eye(3)
    hb[0, 2], hb[1, 2] = 120, 40
    return tex, a, b, ha, hb


def test_multiband_reconstructs_aligned_pair():
    """Two perfectly-registered crops of one texture blend back to it
    everywhere both-or-either covers (no seam artifacts, no black bleed)."""
    tex, a, b, ha, hb = _pair()
    out = multiband_blend([a, b], [ha, hb], bands=4)
    h, w = out.shape[:2]
    yy, xx = np.mgrid[:h, :w]
    covered = ((yy < 160) & (xx < 200)) | ((yy >= 40) & (xx >= 120))
    err = np.abs(out - tex[:h, :w])
    assert err[covered].mean() < 0.5, err[covered].mean()
    # Outside every image's footprint the canvas stays empty.
    assert np.abs(out[~covered]).max() == 0.0


def test_multiband_seam_hides_misalignment():
    """With a misregistered pair, each pixel's high frequencies come from a
    single image: no double edges (the feather average's variance in the
    overlap is strictly larger than the seam blend's)."""
    tex, a, b, ha, hb = _pair()
    # 3px registration error on image b.
    hb_bad = hb.copy()
    hb_bad[0, 2] += 3.0
    from sift_tpu.models.stitch import blend_warped

    seam = multiband_blend([a, b], [ha, hb_bad], bands=4)
    feather = blend_warped([a, b], [ha, hb_bad])
    # Ghosting = doubled edges = reduced local gradient energy in the
    # overlap for the average; the seam blend keeps one image's gradients.
    ov = (slice(60, 140), slice(140, 180))
    gseam = np.abs(np.diff(seam[ov], axis=1)).mean()
    gfeather = np.abs(np.diff(feather[ov], axis=1)).mean()
    assert gseam > gfeather * 1.05, (gseam, gfeather)


def test_estimate_gains_equalizes_exposure():
    tex, a, b, ha, hb = _pair()
    b_bright = np.clip(b * 1.25, 0, 255).astype(np.float32)
    oh, ow, t = _canvas_layout([a, b_bright], [ha, hb])
    g = estimate_gains([a, b_bright], [t @ ha, t @ hb], oh, ow)
    # Gains should compress the 1.25x exposure gap (prior keeps them near 1).
    assert g[1] < g[0], g
    ratio = g[1] / g[0]
    assert 0.78 < ratio < 0.95, ratio


def test_solve_global_offsets_redundant_edges():
    """Redundant (cycle) edges average out inconsistent measurements."""
    t01 = np.array([10.0, 0.0])
    t12 = np.array([12.0, 1.0])
    t02 = np.array([21.0, 2.0])  # inconsistent with t01+t12 = (22, 1)
    off = solve_global_offsets(3, 0, [(0, 1), (1, 2), (0, 2)],
                               [t01, t12, t02])
    np.testing.assert_allclose(off[0], [0, 0], atol=1e-9)
    # o0 - o1 = t01 etc: the LS solution splits the cycle residual.
    assert abs((off[0] - off[1])[0] - 10.0) < 1.0
    assert abs((off[0] - off[2])[0] - 21.5) < 1.0
    # Exactly consistent edges are reproduced exactly.
    off2 = solve_global_offsets(
        3, 1, [(0, 1), (1, 2)], [t01, t12]
    )
    np.testing.assert_allclose(off2[1], [0, 0], atol=1e-9)
    np.testing.assert_allclose(off2[0] - off2[1], t01, atol=1e-7)
    np.testing.assert_allclose(off2[1] - off2[2], t12, atol=1e-7)


def test_overlap_consistency_detects_misalignment():
    tex, a, b, ha, hb = _pair()
    oh, ow, t = _canvas_layout([a, b], [ha, hb])
    good = overlap_consistency([a, b], [t @ ha, t @ hb], oh, ow)
    hb_bad = hb.copy()
    hb_bad[0, 2] += 6.0
    bad = overlap_consistency([a, b], [t @ ha, t @ hb_bad], oh, ow)
    assert good < 1.0, good
    assert bad > good * 3, (good, bad)


def test_warp_coordinates_exact_at_large_canvas_offsets():
    """Integer-translation warps are exact pixel copies EVERYWHERE on a
    wide canvas.

    Regression guard for a real defect: _apply_h's einsum at DEFAULT
    precision runs in bf16 on TPU, quantizing canvas coordinates >= 1024
    to 8-16 px steps — warped sources sampled on a visible block grid over
    the right half of wide panoramas.  With HIGHEST precision the integer
    translation reproduces the source bit-exactly at x ~ 1900.
    """
    import jax.numpy as jnp

    from sift_tpu.models.stitch import _warp_accumulate_impl

    rng = np.random.default_rng(5)
    img = rng.uniform(0, 255, (64, 96, 3)).astype(np.float32)
    tx, ty = 1800, 900  # far corner of a wide canvas
    h_canvas = np.array(
        [[1, 0, tx], [0, 1, ty], [0, 0, 1]], np.float64
    )
    h_inv = np.linalg.inv(h_canvas).astype(np.float32)
    acc, wgt = _warp_accumulate_impl(
        jnp.asarray(img), jnp.asarray(h_inv), 1024, 1984
    )
    acc = np.asarray(acc)[ty : ty + 64, tx : tx + 96]
    w = np.asarray(wgt)[ty : ty + 64, tx : tx + 96]
    inner = (slice(1, 63), slice(1, 95))
    assert (w[inner] > 0).all()
    got = acc[inner] / w[inner][:, :, None]  # un-feather
    np.testing.assert_allclose(got, img[inner], rtol=0, atol=1e-4)
