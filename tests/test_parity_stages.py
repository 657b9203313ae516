"""Stage-level bit-parity tests vs the instrumented C++ reference.

Fixtures are produced by tests/oracle/harness.cpp (see tests/oracle/build.sh)
from the UNMODIFIED reference sources; each test checks one pipeline stage of
the TPU rebuild against the oracle dump, in float64 on CPU where the rebuild's
expression ordering is designed to be bit-faithful.
"""

from __future__ import annotations

import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from sift_tpu import SiftConfig
from sift_tpu.models.sift import detect_stages
from sift_tpu.utils.io import load_image

DATA = pathlib.Path(__file__).parent / "data"

CFG = SiftConfig(
    dtype=jnp.float64, extrema_cap=1024, kp_cap=512, ori_cap=2048
)

CASES = {
    "small": (DATA / "small.png", DATA / "oracle_small.npz"),
    "medium": (DATA / "medium.png", DATA / "oracle_medium.npz"),
}


@pytest.fixture(scope="module", params=sorted(CASES))
def case(request):
    _, npz_path = CASES[request.param]
    oracle = dict(np.load(npz_path))
    # Use the oracle's own stb-decoded pixels (JPEG decoders differ).
    img = oracle["input"].astype(np.float64)
    octaves = int(oracle["octaves_count"][0])
    stages = detect_stages(jnp.asarray(img), CFG, octaves)
    return oracle, stages, img


@pytest.fixture()
def oracle(case):
    return case[0]


@pytest.fixture()
def stages(case):
    return case[1]


def test_octaves_and_kernels(oracle, case):
    h, w = case[2].shape[:2]
    assert CFG.octaves_count(w * 2, h * 2) == int(oracle["octaves_count"][0])
    np.testing.assert_array_equal(
        np.asarray(CFG.gaussian_kernels()), oracle["gaussian_kernels"]
    )


def test_initial_image(oracle, stages):
    np.testing.assert_array_equal(np.asarray(stages["initial"]), oracle["initial"])


def test_gaussian_pyramid(oracle, stages):
    octaves = int(oracle["octaves_count"][0])
    for o in range(octaves):
        g = np.asarray(stages["gaussians"][o])
        for i in range(g.shape[0]):
            np.testing.assert_array_equal(
                g[i], oracle[f"gauss.{o}.{i}"], err_msg=f"gauss[{o}][{i}]"
            )


def test_dog_pyramid(oracle, stages):
    octaves = int(oracle["octaves_count"][0])
    for o in range(octaves):
        d = np.asarray(stages["dogs"][o])
        for i in range(d.shape[0]):
            np.testing.assert_array_equal(
                d[i], oracle[f"dog.{o}.{i}"], err_msg=f"dog[{o}][{i}]"
            )


def test_extrema(oracle, stages):
    # oracle rows: (x, y, layer, octave) — src/sift.cpp:284
    ref = {tuple(r) for r in oracle["extrema"]}
    mine = set()
    for o, (zyx, valid) in enumerate(stages["extrema"]):
        zyx = np.asarray(zyx)[np.asarray(valid)]
        for z, y, x in zyx:
            mine.add((x, y, z, o))
    assert mine == ref


def _kp_set(d, prefix, fields=("x", "y", "size", "pori", "octave", "layer")):
    cols = [d[f"{prefix}.{f}"] for f in fields]
    return {tuple(float(c[i]) for c in cols) for i in range(len(cols[0]))}


def test_refined_keypoints(oracle, stages):
    ref = _kp_set(oracle, "refined", ("x", "y", "size", "octave", "layer"))
    mine = set()
    for kp in stages["refined"]:
        v = np.asarray(kp.valid)
        for i in np.nonzero(v)[0]:
            mine.add(
                (
                    float(kp.x[i]), float(kp.y[i]), float(kp.size[i]),
                    float(kp.octave[i]), float(kp.layer[i]),
                )
            )
    assert mine == ref


def test_oriented_keypoints(oracle, stages):
    # pori carries ~1-ulp noise from libm (exp/atan2) differences between XLA
    # and glibc in the orientation histogram; x/y/size are bit-exact and
    # descriptors remain byte-exact (see final test), so compare pori at 1e-9.
    ref = _kp_set(oracle, "oriented")
    ref = {(x, y, s, round(p, 9), o, l) for (x, y, s, p, o, l) in ref}
    mine = set()
    for kp in stages["oriented"]:
        v = np.asarray(kp.valid)
        for i in np.nonzero(v)[0]:
            mine.add(
                (
                    float(kp.x[i]), float(kp.y[i]), float(kp.size[i]),
                    round(float(kp.pori[i]), 9), float(kp.octave[i]),
                    float(kp.layer[i]),
                )
            )
    assert mine == ref


def test_final_keypoints_and_descriptors(oracle, stages):
    final = stages["final"]
    v = np.asarray(final.valid)
    mine = {}
    for i in np.nonzero(v)[0]:
        key = (
            float(final.x[i]), float(final.y[i]), float(final.size[i]),
            round(float(final.pori[i]), 9),
        )
        mine[key] = np.asarray(final.desc[i])
    ref = {}
    n = len(oracle["final.x"])
    for i in range(n):
        key = (
            float(oracle["final.x"][i]), float(oracle["final.y"][i]),
            float(oracle["final.size"][i]), round(float(oracle["final.pori"][i]), 9),
        )
        ref[key] = oracle["final.desc"][i]
    assert set(mine) == set(ref)
    mismatched = 0
    for key in ref:
        if not np.array_equal(mine[key], ref[key]):
            mismatched += np.sum(mine[key] != ref[key])
    # Descriptors quantize with floor(512*v); allow no byte mismatches here —
    # relax only if cross-libm ulp noise ever flips a quantization boundary.
    assert mismatched == 0, f"{mismatched} descriptor bytes differ"


def test_fused_path_matches_oracle(oracle, case):
    """The fused production pipeline (detect_and_describe: one global
    compaction + mixed-octave refine/orient/descriptors) reproduces the
    oracle's final keypoints and descriptors, like the staged path above."""
    from sift_tpu.models.sift import detect_and_describe

    _, _, img = case
    final = detect_and_describe(img, CFG)
    v = np.asarray(final.valid)
    mine = {}
    for i in np.nonzero(v)[0]:
        key = (
            float(final.x[i]), float(final.y[i]), float(final.size[i]),
            round(float(final.pori[i]), 9),
        )
        mine[key] = np.asarray(final.desc[i])
    ref = {}
    for i in range(len(oracle["final.x"])):
        key = (
            float(oracle["final.x"][i]), float(oracle["final.y"][i]),
            float(oracle["final.size"][i]), round(float(oracle["final.pori"][i]), 9),
        )
        ref[key] = oracle["final.desc"][i]
    assert set(mine) == set(ref)
    mismatched = sum(
        int(np.sum(mine[k] != ref[k])) for k in ref
    )
    assert mismatched == 0, f"{mismatched} descriptor bytes differ"
