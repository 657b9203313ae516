"""End-to-end parity vs the reference on the real stitching corpus.

The contract from BASELINE.json: bit-faithful SIFT match sets vs the C++
reference.  Oracle fixtures hold the reference's final keypoints +
descriptors for CAVE-01 00/01 (640x480) and the demo pair; matching both
sides with exact integer math must reproduce the oracle match sets
(165 matches on CAVE-01 00<->01, measured in BASELINE.md).
"""

from __future__ import annotations

import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from sift_tpu import SiftConfig, match_descriptors
from sift_tpu.models.sift import detect_stages
from sift_tpu.utils.io import load_image

DATA = pathlib.Path(__file__).parent / "data"
CAVE = pathlib.Path("/root/reference/stitching/collection/Dataset/CAVE-01_atrium")

CFG = SiftConfig(dtype=jnp.float64)


def _detect(npz_path) -> "Keypoints":
    # Feed the oracle's stb-decoded pixels (JPEG decoders differ between
    # stb_image and libjpeg; the parity contract covers the pipeline).
    img = dict(np.load(npz_path))["input"].astype(np.float64)
    h, w = img.shape[:2]
    octaves = CFG.octaves_count(w * 2, h * 2)
    return detect_stages(jnp.asarray(img), CFG, octaves)["final"]


def _final_dict(kp):
    v = np.asarray(kp.valid)
    out = {}
    for i in np.nonzero(v)[0]:
        key = (
            float(kp.x[i]), float(kp.y[i]), float(kp.size[i]),
            round(float(kp.pori[i]), 9),
        )
        out[key] = np.asarray(kp.desc[i])
    return out


def _oracle_dict(npz):
    d = dict(np.load(npz))
    out = {}
    for i in range(len(d["final.x"])):
        key = (
            float(d["final.x"][i]), float(d["final.y"][i]),
            float(d["final.size"][i]), round(float(d["final.pori"][i]), 9),
        )
        out[key] = d["final.desc"][i]
    return out


@pytest.fixture(scope="module")
def cave():
    kp0 = _detect(DATA / "oracle_cave00.npz")
    kp1 = _detect(DATA / "oracle_cave01.npz")
    return kp0, kp1


def test_cave_keypoint_sets(cave):
    kp0, kp1 = cave
    for kp, npz, expect in ((kp0, "oracle_cave00.npz", 677), (kp1, "oracle_cave01.npz", 1067)):
        mine = _final_dict(kp)
        ref = _oracle_dict(DATA / npz)
        assert len(ref) == expect  # baseline anchor (BASELINE.md)
        missing = set(ref) - set(mine)
        extra = set(mine) - set(ref)
        assert not missing and not extra, (
            f"{npz}: {len(missing)} missing, {len(extra)} extra of {len(ref)}"
        )
        byte_diffs = sum(
            int((mine[k] != ref[k]).sum()) for k in ref
        )
        assert byte_diffs == 0, f"{npz}: {byte_diffs} descriptor bytes differ"


@pytest.mark.parametrize("pair", [("cave01", "cave02"), ("cave02", "cave03")])
def test_more_scene_pairs_match_sets(pair):
    """Match-set parity generalizes across the scene graph (01<->02, 02<->03)."""
    a, b = pair
    kpa = _detect(DATA / f"oracle_{a}.npz")
    kpb = _detect(DATA / f"oracle_{b}.npz")
    ra = _oracle_dict(DATA / f"oracle_{a}.npz")
    rb = _oracle_dict(DATA / f"oracle_{b}.npz")
    assert set(_final_dict(kpa)) == set(ra)
    assert set(_final_dict(kpb)) == set(rb)

    idx, accept, _, _ = match_descriptors(kpa.desc, kpa.valid, kpb.desc, kpb.valid)
    accept = np.asarray(accept)
    idx = np.asarray(idx)

    da = np.stack(list(ra.values())).astype(np.int64)
    db = np.stack(list(rb.values())).astype(np.int64)
    d2 = (
        (da * da).sum(1)[:, None] + (db * db).sum(1)[None, :] - 2 * (da @ db.T)
    )
    bi = d2.argmin(1)
    best = d2[np.arange(len(da)), bi]
    d2m = d2.copy()
    d2m[np.arange(len(da)), bi] = 1 << 60
    second = d2m.min(1)
    acc_ref = 16 * best < 9 * second
    assert int(accept.sum()) == int(acc_ref.sum())

    keys_a = list(ra)
    keys_b = list(rb)
    ref_pairs = {(keys_a[i], keys_b[bi[i]]) for i in np.nonzero(acc_ref)[0]}
    my_pairs = set()
    for lane in np.nonzero(accept)[0]:
        j = idx[lane]
        my_pairs.add((
            (float(kpa.x[lane]), float(kpa.y[lane]), float(kpa.size[lane]),
             round(float(kpa.pori[lane]), 9)),
            (float(kpb.x[j]), float(kpb.y[j]), float(kpb.size[j]),
             round(float(kpb.pori[j]), 9)),
        ))
    assert my_pairs == ref_pairs


def test_demo_pair_match_count():
    """The reference demo pair (755x499, 8 octaves): 1286/1430 keypoints,
    269 matches (BASELINE.md anchors)."""
    kp1 = _detect(DATA / "oracle_demo1.npz")
    kp2 = _detect(DATA / "oracle_demo2.npz")
    assert int(kp1.count()) == 1286
    assert int(kp2.count()) == 1430
    ref1 = _oracle_dict(DATA / "oracle_demo1.npz")
    ref2 = _oracle_dict(DATA / "oracle_demo2.npz")
    mine1 = _final_dict(kp1)
    mine2 = _final_dict(kp2)
    assert set(mine1) == set(ref1)
    assert set(mine2) == set(ref2)
    byte_diffs = sum(int((mine1[k] != ref1[k]).sum()) for k in ref1)
    byte_diffs += sum(int((mine2[k] != ref2[k]).sum()) for k in ref2)
    assert byte_diffs == 0

    idx, accept, _, _ = match_descriptors(
        kp1.desc, kp1.valid, kp2.desc, kp2.valid
    )
    assert int(np.asarray(accept).sum()) == 269


def test_cave_match_set(cave):
    kp0, kp1 = cave
    ref0 = _oracle_dict(DATA / "oracle_cave00.npz")
    ref1 = _oracle_dict(DATA / "oracle_cave01.npz")

    # Match my keypoints (sorted order == reference clean_keypoints order).
    idx, accept, best, second = match_descriptors(
        kp0.desc, kp0.valid, kp1.desc, kp1.valid
    )
    accept = np.asarray(accept)
    idx = np.asarray(idx)

    # Oracle matches computed with the same exact integer math from the
    # oracle's own descriptors (reference match loop src/sift.cpp:783-815).
    d0 = np.stack(list(ref0.values())).astype(np.int64)
    d1 = np.stack(list(ref1.values())).astype(np.int64)
    d2 = (
        (d0 * d0).sum(1)[:, None]
        + (d1 * d1).sum(1)[None, :]
        - 2 * (d0 @ d1.T)
    )
    bi = d2.argmin(1)
    b = d2[np.arange(len(d0)), bi]
    d2m = d2.copy()
    d2m[np.arange(len(d0)), bi] = 1 << 60
    s = d2m.min(1)
    acc_ref = 16 * b < 9 * s

    assert acc_ref.sum() == 165  # baseline anchor (BASELINE.md)

    keys0 = list(ref0)
    keys1 = list(ref1)
    ref_pairs = {
        (keys0[i], keys1[bi[i]]) for i in np.nonzero(acc_ref)[0]
    }

    v0 = np.asarray(kp0.valid)
    lanes0 = np.nonzero(v0)[0]
    my_pairs = set()
    for li, lane in enumerate(lanes0):
        if accept[lane]:
            j = idx[lane]
            k0 = (
                float(kp0.x[lane]), float(kp0.y[lane]), float(kp0.size[lane]),
                round(float(kp0.pori[lane]), 9),
            )
            k1 = (
                float(kp1.x[j]), float(kp1.y[j]), float(kp1.size[j]),
                round(float(kp1.pori[j]), 9),
            )
            my_pairs.add((k0, k1))

    assert my_pairs == ref_pairs
    assert len(my_pairs) == 165
