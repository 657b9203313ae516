"""Device mesh construction.

The reference has no parallelism at all (single thread, src/main.cpp); the
TPU design scales along two axes:
  - ``data``: batch of images / frames (pure data parallel)
  - ``kp``:   keypoint/descriptor shards (matching, BA blocks)

XLA collectives over ICI are the comm backend — no NCCL/MPI analogue needed
(SURVEY.md section 2.7).  Multi-host bring-up uses jax.distributed.initialize;
single-process multi-device testing uses
``XLA_FLAGS=--xla_force_host_platform_device_count=N`` (same code path).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: int = 1, kp: int = 1, devices=None) -> Mesh:
    """(data, kp) mesh over the first data*kp visible devices."""
    devices = devices if devices is not None else jax.devices()
    n = data * kp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, kp)
    return Mesh(arr, ("data", "kp"))
