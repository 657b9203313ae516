"""Gaussian / DoG pyramid construction.

TPU-native rebuild of the reference pipeline stages:
  - compute_initial_image  (src/sift.cpp:113-126)
  - compute_gaussian_octave/images (src/sift.cpp:161-202)
  - compute_dog_images     (src/sift.cpp:209-225)

Octave shapes differ, so the octave loop is unrolled at trace time (octave
count is a host-side function of the input dims).  Within an octave the
gaussian images are stacked (S+3, H, W) so downstream stages can
dynamically index by layer.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from sift_tpu.config import SiftConfig
from sift_tpu.ops.blur import separable_blur
from sift_tpu.ops.color import to_grayscale
from sift_tpu.ops.pallas_blur import pallas_blur_fits, pallas_separable_blur
from sift_tpu.ops.pallas_pyramid import fused_octave_blur, fused_octave_fits
from sift_tpu.ops.resize import downsample_nearest_x2, upsample_bilinear
from sift_tpu.config import gaussian_half_kernel


def _blur(img: jnp.ndarray, half_kernel: list[float], cfg: SiftConfig):
    """Route one blur through the Pallas strip kernel or the XLA path.

    Same math and accumulation order (differences limited to last-ulp FMA
    contraction choices); the f64 parity profile always takes the XLA path.
    CAUTION: do not enable Pallas under vmap — jax's pallas batching rule
    lifts the batch dim into the BLOCK shape (VMEM overflow for big images);
    pass images batched as (B, H, W) instead (the kernel grids over B).
    """
    use = cfg.use_pallas_blur
    if use is None:
        # Auto currently resolves to the XLA path: the pyramid traces ~80
        # Mosaic kernels and the per-kernel AOT compile (~10 s each on the
        # axon tunnel) dwarfs the ~25% runtime win.  Opt in explicitly for
        # long-running deployments where the compile amortizes.
        use = False
    if use and pallas_blur_fits(img.shape, cfg.dtype):
        return pallas_separable_blur(img, half_kernel)
    return separable_blur(img, half_kernel)


def compute_initial_image(img: jnp.ndarray, cfg: SiftConfig) -> jnp.ndarray:
    """Grayscale -> optional 2x bilinear upsample -> blur sqrt(sigma^2 - 1).

    Matches src/sift.cpp:113-126 including the quirk that the sqrt(sigma^2-1)
    pre-blur is applied whether or not the image was doubled.
    """
    gray = to_grayscale(img).astype(cfg.dtype)
    if cfg.double_image_size:
        gray = upsample_bilinear(gray, 2, 2)
    sigma = math.sqrt(cfg.init_sigma * cfg.init_sigma - 1)
    return _blur(gray, gaussian_half_kernel(sigma), cfg)


def build_pyramids(
    initial: jnp.ndarray, cfg: SiftConfig, octaves: int
) -> tuple[list[jnp.ndarray], list[jnp.ndarray]]:
    """Returns (gaussians, dogs): per octave, stacked (S+3, H_o, W_o) gaussian
    images and (S+2, H_o, W_o) DoG images.

    Incremental blurring per src/sift.cpp:161-174; next octave seeds from the
    2-sigma layer (index ``intervals``) downsampled by nearest-neighbor
    (src/sift.cpp:195-196).
    """
    kernels = cfg.gaussian_kernels()
    half_kernels = [gaussian_half_kernel(s) for s in kernels]
    fused = cfg.use_pallas_pyramid
    if fused is None:
        # Auto: the fused octave kernel wins ~25% of the pyramid stage on
        # v5e (PERF.md) and its per-shape compile amortizes via the
        # persistent cache.  Vmapped traces must opt out explicitly
        # (detect_fn / parallel.spatial do) — jax's pallas batching rule
        # would lift the batch dim into the block shape.
        fused = jax.default_backend() == "tpu" and (
            jnp.dtype(cfg.dtype) == jnp.float32
        )

    gaussians: list[jnp.ndarray] = []
    dogs: list[jnp.ndarray] = []
    img = initial
    for _ in range(octaves):
        if fused and fused_octave_fits(img.shape, half_kernels[1:], cfg.dtype):
            # One Pallas program per octave: 5 chained blurs + 5 DoGs in a
            # single VMEM pass (ops/pallas_pyramid.py).  Do NOT use under
            # vmap (pass the batch as a leading dim instead).
            gs, ds = fused_octave_blur(img, half_kernels[1:])
            layers = [img] + gs
            g = jnp.stack(layers, axis=-3)
            gaussians.append(g)
            dogs.append(jnp.stack(ds, axis=-3))
        else:
            layers = [img]
            for i in range(1, len(kernels)):
                layers.append(_blur(layers[-1], half_kernels[i], cfg))
            # Layer stack on axis -3: (S, H, W), or (B, S, H, W) when
            # ``initial`` carries a leading batch dim (the batched
            # production path).
            g = jnp.stack(layers, axis=-3)
            gaussians.append(g)
            # src/sift.cpp:217 (img[i+1] - img[i])
            dogs.append(
                jax.lax.slice_in_dim(g, 1, g.shape[-3], axis=-3)
                - jax.lax.slice_in_dim(g, 0, g.shape[-3] - 1, axis=-3)
            )
        img = downsample_nearest_x2(layers[len(kernels) - 3])
    return gaussians, dogs
