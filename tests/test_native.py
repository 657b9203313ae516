"""Native runtime (C++ loader + rasterizers) tests; skipped if not built."""

from __future__ import annotations

import numpy as np
import pytest

from sift_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)

CAVE = "/root/reference/stitching/collection/Dataset/CAVE-01_atrium"


def test_decode_matches_pillow():
    from PIL import Image

    path = f"{CAVE}/00.jpg"
    mine = native.decode_image(path)
    ref = np.asarray(Image.open(path)).astype(np.float32)
    np.testing.assert_array_equal(mine, ref)


def test_threaded_loader_order():
    paths = [f"{CAVE}/{i:02d}.jpg" for i in range(5)]
    loader = native.ImageLoader(paths, n_threads=3)
    imgs = list(loader)
    assert len(imgs) == 5
    singles = [native.decode_image(p) for p in paths]
    for a, b in zip(imgs, singles):
        np.testing.assert_array_equal(a, b)


def test_draw_keypoints_native_matches_python():
    from sift_tpu.utils import draw

    rng = np.random.default_rng(0)
    # integer pixels: exact under the native path's float32 round-trip
    img = rng.integers(0, 256, (64, 80, 3)).astype(np.float64)
    kps = dict(
        x=np.array([20.0, 60.0]), y=np.array([30.0, 10.0]),
        layer=np.array([1, 3]), pori=np.array([0.3, 2.0]),
        size=np.array([2.0, 3.0]),
    )
    out_native = draw.draw_keypoints(img, kps, 6)

    # Pure python reference path.
    out_py = np.ascontiguousarray(img.astype(np.float64))
    max_r, min_r = 110.0, 5.0
    import math

    for x, y, layer, pori in zip(kps["x"], kps["y"], kps["layer"], kps["pori"]):
        radius = int(min_r * math.exp(layer / 5 * math.log(max_r / min_r)))
        color = draw._KP_COLORS[int(layer) % 7]
        draw.draw_circle(out_py, x, y, radius, color)
        x2 = int(x + radius * math.cos(pori))
        y2 = int(y + radius * math.sin(pori))
        draw.draw_line(out_py, int(x), int(y), x2, y2, color)
    np.testing.assert_array_equal(out_native, out_py)
