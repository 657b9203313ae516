"""Host-side image I/O.

The reference vendors stb_image/stb_image_write (src/stb_image.h,
src/stb_image_write.h) and stores pixels as doubles in [0, 255]
(src/image_io.hh:22-52).  Codecs are not a device concern on TPU: we decode on
the host (Pillow) straight into float arrays in the same [0, 255] convention,
dropping alpha like the reference (src/image_io.cpp:27 clamps channels to 3).
"""

from __future__ import annotations

import numpy as np
from PIL import Image as PILImage


def load_image(path: str, dtype=np.float32) -> np.ndarray:
    """Load an image file as (H, W, C) float array in [0, 255], C in {1, 3}.

    Uses the native C++ decoder (csrc/) when built — same libjpeg/libpng
    codecs as Pillow, decoded straight into float32 without a uint8 hop —
    and falls back to Pillow otherwise.
    """
    if dtype == np.float32:
        from sift_tpu.utils import native

        if native.available():
            arr = native.decode_image(path)
            if arr is not None:
                if arr.shape[2] > 3:
                    arr = arr[:, :, :3]
                return arr
    with PILImage.open(path) as im:
        if im.mode in ("RGBA", "P", "CMYK", "LA"):
            im = im.convert("RGB")
        arr = np.asarray(im)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.shape[2] > 3:
        arr = arr[:, :, :3]
    return arr.astype(dtype)


def save_image(path: str, arr: np.ndarray) -> None:
    """Save (H, W) or (H, W, C) float array in [0, 255]; clamps like
    src/image_io.cpp:103-104."""
    a = np.clip(np.asarray(arr), 0, 255).astype(np.uint8)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    PILImage.fromarray(a).save(path)
