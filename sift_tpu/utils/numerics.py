"""Small numeric helpers shared across the pipeline."""

from __future__ import annotations

import jax.numpy as jnp


def round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """C++ ``std::round``: round half away from zero.

    ``jnp.round`` rounds half to even, which diverges from the reference at
    .5 boundaries (used for Newton steps src/sift.cpp:401-403, octave coords
    src/sift.cpp:458-459, histogram bins src/sift.cpp:489, radii
    src/sift.cpp:463,636).
    """
    return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5))
