"""Checkpoint / resume for pipeline artifacts.

The reference recomputes everything from scratch on every run (its only
artifacts are terminal PNGs, src/sift.cpp:768,875).  Here every stage output
is persistable: keypoint/descriptor buffers per image (npz), so matching /
stitching / SfM resume without re-detection, and BA state snapshots so long
optimizations restart mid-run.  Cache keys hash the image path, its mtime
and the config, so stale entries self-invalidate.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import pathlib

import numpy as np

from sift_tpu.config import SiftConfig
from sift_tpu.utils.keypoints import Keypoints


def save_keypoints(path: str, kp: Keypoints) -> None:
    np.savez_compressed(
        path,
        x=np.asarray(kp.x), y=np.asarray(kp.y),
        octave=np.asarray(kp.octave), layer=np.asarray(kp.layer),
        size=np.asarray(kp.size), pori=np.asarray(kp.pori),
        desc=np.asarray(kp.desc), valid=np.asarray(kp.valid),
    )


def load_keypoints(path: str) -> Keypoints:
    import jax.numpy as jnp

    d = np.load(path)
    return Keypoints(
        x=jnp.asarray(d["x"]), y=jnp.asarray(d["y"]),
        octave=jnp.asarray(d["octave"]), layer=jnp.asarray(d["layer"]),
        size=jnp.asarray(d["size"]), pori=jnp.asarray(d["pori"]),
        desc=jnp.asarray(d["desc"]), valid=jnp.asarray(d["valid"]),
    )


def _cache_key(image_path: str, cfg: SiftConfig) -> str:
    st = os.stat(image_path)
    cfg_desc = json.dumps(
        {f.name: str(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)},
        sort_keys=True,
    )
    h = hashlib.sha1(
        f"{os.path.abspath(image_path)}|{st.st_mtime_ns}|{st.st_size}|{cfg_desc}".encode()
    )
    return h.hexdigest()[:20]


def cached_detect(
    image_path: str,
    cfg: SiftConfig | None = None,
    cache_dir: str = ".sift_tpu_cache",
) -> Keypoints:
    """detect_and_describe with on-disk resume.

    First call detects and persists; later calls (same file + config) load
    the checkpoint — so a crashed scene run resumes where it stopped.
    """
    from sift_tpu import detect_and_describe
    from sift_tpu.utils.io import load_image

    cfg = cfg or SiftConfig()
    cache = pathlib.Path(cache_dir)
    cache.mkdir(parents=True, exist_ok=True)
    entry = cache / f"kp_{_cache_key(image_path, cfg)}.npz"
    if entry.exists():
        try:
            return load_keypoints(str(entry))
        except Exception:
            entry.unlink(missing_ok=True)
    kp = detect_and_describe(load_image(image_path), cfg)
    save_keypoints(str(entry), kp)
    return kp


def save_ba_state(path: str, cams, points, meta: dict | None = None) -> None:
    np.savez_compressed(
        path,
        cams=np.asarray(cams), points=np.asarray(points),
        meta=json.dumps(meta or {}),
    )


def load_ba_state(path: str):
    d = np.load(path, allow_pickle=False)
    return d["cams"], d["points"], json.loads(str(d["meta"]))
