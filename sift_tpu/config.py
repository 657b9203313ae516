"""Configuration for the TPU-native SIFT / SfM engine.

The reference carries its knobs as compile-time ``#define``s (sift.hh:5-13) and
default function arguments (sift.hh:65-75).  Here everything lives in one frozen
dataclass so shapes and constants stay static under ``jax.jit``.

Reference defaults: /root/reference/src/sift.hh:65-75.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax.numpy as jnp

# Compile-time constants from the reference (src/sift.hh:5-13).
M_PI2 = 6.283185307179586
MAX_CONVERGENCE_STEPS = 5
CONVERGENCE_THR = 0.5
ORI_SMOOTH_ITERATIONS = 2
DESC_HIST_WIDTH = 4
DESC_HIST_BINS = 8
DESC_MAGNITUDE_THR = 0.2
INT_DESCR_FCTR = 512.0


@dataclasses.dataclass(frozen=True)
class SiftConfig:
    """All SIFT pipeline knobs (reference defaults from src/sift.hh:65-75).

    The capacity fields are TPU-specific: every dynamically sized collection in
    the reference (extrema lists, keypoint vectors) becomes a fixed-capacity
    buffer with a validity mask so that all shapes are static under jit.
    """

    double_image_size: bool = True
    init_sigma: float = 1.6
    intervals: int = 3
    window_size: int = 3
    contrast_threshold: float = 0.04
    eigen_ratio: float = 10.0
    num_bins: int = 36
    peak_ratio: float = 0.8
    ori_sigma_factor: float = 1.5
    desc_scale_factor: float = 3.0
    ratio_threshold: float = 0.75

    # --- TPU static-shape capacities ---
    # Fused production path: GLOBAL (all-octave) capacities; overflow is
    # detected via the true counts returned by detect_and_describe_batch
    # (return_counts=True).  Staged/debug path: per-octave capacity at
    # octave 0, halved per octave via *_for_octave below.
    extrema_cap: int = 8192
    kp_cap: int = 4096
    # Total oriented-keypoint capacity across all octaves (both paths).
    ori_cap: int = 8192
    # Legacy single phase-2 Newton capacity.  None (default) = the measured
    # cascade schedule of detect.refine_cascade_caps: steps {2} on
    # extrema_cap//4 lanes, steps {3,4,5} on extrema_cap//8 (lanes still
    # moving shrink fast: ~24%/~12% of valid extrema on real images).
    # Setting an int pins the old two-phase schedule (4 steps at that cap).
    refine_active_cap: int | None = None

    # Compute dtype for the image pipeline.  float32 on TPU ("fast" profile);
    # float64 on CPU with jax_enable_x64 for the bit-parity profile.
    dtype: Any = jnp.float32

    # Pyramid blur backend: None = auto (Pallas VMEM kernel on TPU f32 when
    # the image fits, XLA shifted-adds otherwise).  Both are bit-identical.
    use_pallas_blur: bool | None = None

    # Octave builder backend: None = auto (currently the XLA blur chain;
    # flips to the fused multi-sigma Pallas kernel — all 5 chained blurs +
    # DoGs in one VMEM pass, ops/pallas_pyramid.py — once its on-chip win
    # AND pyramid bit-identity are verified).  f32 only; forced off under
    # vmap like use_pallas_blur.
    use_pallas_pyramid: bool | None = None

    # ----- derived, host-side helpers (pure Python f64 to match glibc) -----

    def gaussian_kernels(self) -> list[float]:
        """Incremental blur sigmas (reference: src/sift.cpp:143-155)."""
        n = self.intervals + 3
        ks = [0.0] * n
        ks[0] = self.init_sigma
        k = math.pow(2.0, 1.0 / self.intervals)
        for i in range(1, n):
            sigma_prev = math.pow(k, i - 1) * self.init_sigma
            ks[i] = sigma_prev * math.sqrt(k * k - 1)
        return ks

    def octaves_count(self, width: int, height: int) -> int:
        """Number of octaves (reference: src/sift.cpp:132-137).

        Note the reference uses C++ integer division ``min_size / 3``.
        """
        min_size = min(width, height)
        return int(math.floor(math.log2(min_size // 3)))

    def extrema_cap_for_octave(self, octave: int) -> int:
        return max(self.extrema_cap >> octave, 256)

    def kp_cap_for_octave(self, octave: int) -> int:
        return max(self.kp_cap >> octave, 128)

    def extremum_threshold(self) -> float:
        """Pre-filter threshold (reference: src/sift.cpp:305-307, "OpenCV formula")."""
        return math.floor(0.5 * self.contrast_threshold / float(self.intervals) * 255.0)


def gaussian_half_kernel(sigma: float) -> list[float]:
    """One-sided gaussian taps as the reference builds them (src/image.cpp:226-235).

    Computed with Python/glibc ``exp`` so the parity (f64) profile matches the
    C++ binary bit-for-bit.  Unnormalized: normalization happens by dividing by
    the (constant) applied-weight sum inside the blur, exactly as the reference
    divides by ``sum_w`` (src/image.cpp:170-185).
    """
    size = int(math.ceil(3 * sigma)) + 1
    exp_denom = 2 * sigma * sigma
    coef = 1 / (math.sqrt(2 * math.pi) * sigma)
    return [math.exp(-(i * i) / exp_denom) * coef for i in range(size)]


def half_kernel_weight_sum(kernel: list[float]) -> float:
    """The constant ``sum_w`` of the reference conv (src/image.cpp:170-184).

    The reference adds ``2*w`` per off-center tap unconditionally (clamped
    border taps still read the edge pixel), so the normalizer is the same for
    every pixel: k0 + 2*k1 + ... computed in this exact order.
    """
    s = kernel[0]
    for u in range(1, len(kernel)):
        s += 2.0 * kernel[u]
    return s
