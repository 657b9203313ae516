"""Checkpoint/resume, profiling, drawing and CLI smoke tests."""

from __future__ import annotations

import json
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from sift_tpu import SiftConfig
from sift_tpu.utils.checkpoint import (
    cached_detect,
    load_ba_state,
    load_keypoints,
    save_ba_state,
    save_keypoints,
)
from sift_tpu.utils.keypoints import Keypoints, sort_and_dedup
from sift_tpu.utils.profiling import Metrics, StageTimer


def test_keypoints_roundtrip(tmp_path):
    kp = Keypoints.empty(16)
    kp.x = kp.x.at[0].set(3.5)
    kp.valid = kp.valid.at[0].set(True)
    p = tmp_path / "kp.npz"
    save_keypoints(str(p), kp)
    kp2 = load_keypoints(str(p))
    assert float(kp2.x[0]) == 3.5
    assert int(kp2.count()) == 1


def test_cached_detect_resumes(tmp_path):
    from sift_tpu.utils.io import save_image

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    path = tmp_path / "img.png"
    save_image(str(path), img.astype(np.float64))

    cfg = SiftConfig(dtype=jnp.float32, extrema_cap=256, kp_cap=128)
    kp1 = cached_detect(str(path), cfg, cache_dir=str(tmp_path / "cache"))
    entries = list((tmp_path / "cache").glob("kp_*.npz"))
    assert len(entries) == 1
    kp2 = cached_detect(str(path), cfg, cache_dir=str(tmp_path / "cache"))
    np.testing.assert_array_equal(np.asarray(kp1.valid), np.asarray(kp2.valid))
    np.testing.assert_array_equal(np.asarray(kp1.desc), np.asarray(kp2.desc))


def test_ba_state_roundtrip(tmp_path):
    p = tmp_path / "ba.npz"
    save_ba_state(str(p), np.ones((3, 6)), np.zeros((5, 3)), {"iter": 7})
    cams, pts, meta = load_ba_state(str(p))
    assert cams.shape == (3, 6)
    assert meta["iter"] == 7


def test_stage_timer_and_metrics():
    t = StageTimer()
    with t.stage("blur"):
        pass
    with t.stage("blur"):
        pass
    s = t.summary()
    assert s["blur"]["calls"] == 2
    m = Metrics()
    m.set("fps", 100.0)
    assert json.loads(m.to_json())["fps"] == 100.0


def test_sort_and_dedup_removes_duplicates():
    kp = Keypoints.empty(8)
    for i, (x, size, octv) in enumerate([(1.0, 2.0, 0), (1.0, 2.0, 1), (0.5, 1.0, 0)]):
        kp.x = kp.x.at[i].set(x)
        kp.y = kp.y.at[i].set(1.0)
        kp.size = kp.size.at[i].set(size)
        kp.octave = kp.octave.at[i].set(octv)
        kp.valid = kp.valid.at[i].set(True)
    out = sort_and_dedup(kp)
    assert int(out.count()) == 2
    v = np.asarray(out.valid)
    xs = np.asarray(out.x)[v]
    # sorted by x ascending; duplicate (x=1, size=2) collapsed, keeping the
    # higher octave first per the reference tie-break (src/sift.hh:40)
    assert list(xs) == [0.5, 1.0]
    assert np.asarray(out.octave)[v][1] == 1


def test_cli_runs(tmp_path):
    from sift_tpu.utils.io import save_image

    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, (56, 72, 3)).astype(np.float64)
    save_image(str(tmp_path / "a.png"), base)
    save_image(str(tmp_path / "b.png"), np.roll(base, 3, axis=1))
    out = subprocess.run(
        [
            sys.executable, "-m", "sift_tpu",
            str(tmp_path / "a.png"), str(tmp_path / "b.png"),
            "--out-dir", str(tmp_path), "--json", "--f64",
        ],
        capture_output=True, text=True, timeout=560,
        env={**__import__("os").environ, "PYTHONPATH": "."},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["keypoints1"] >= 0
    assert (tmp_path / "matches.png").exists()


def test_checked_catches_nan():
    import jax.numpy as jnp

    from sift_tpu.utils.debug import assert_finite, checked

    f = checked(lambda x: x / x)  # 0/0 -> NaN
    with pytest.raises(Exception):
        f(jnp.zeros(4))

    with pytest.raises(FloatingPointError):
        assert_finite({"a": np.array([1.0, np.nan])})
    assert_finite({"a": np.array([1.0, 2.0])})


def test_downsample_mxu_bitwise_matches_slice():
    """downsample_nearest_x2_mxu (row-pair reshape + one-hot HIGHEST
    contraction) is bit-identical to the strided-slice formulation on
    pixel-domain f32, odd and even dims, batched and not."""
    import jax.numpy as jnp

    from sift_tpu.ops.resize import (
        downsample_nearest_x2,
        downsample_nearest_x2_mxu,
    )

    rng = np.random.default_rng(7)
    for shape in [(8, 10), (9, 13), (3, 31, 64), (2, 5, 17, 22)]:
        x = jnp.asarray(
            (rng.uniform(-1, 256, shape) * rng.uniform(1e-6, 1.0, shape))
            .astype(np.float32)
        )
        a = np.asarray(downsample_nearest_x2(x))
        b = np.asarray(downsample_nearest_x2_mxu(x))
        np.testing.assert_array_equal(a, b)
