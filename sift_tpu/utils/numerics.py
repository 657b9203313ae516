"""Small numeric helpers shared across the pipeline.

Exact-fp helpers: XLA CPU's elementwise emitter lowers mul+add chains through
``llvm.fmuladd`` (FMA contraction) and rewrites division by a constant into
multiplication by its reciprocal — both change the last ulp vs the C++
reference, which compiles without FMA (baseline x86-64, /root/reference/
Makefile:5).  For the float64 parity profile we pin C++ semantics by hiding
products and divisor constants behind ``optimization_barrier``; in float32
(the TPU fast profile) the helpers are identity and XLA fuses freely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _barrier64(x: jnp.ndarray) -> jnp.ndarray:
    if x.dtype == jnp.float64:
        return jax.lax.optimization_barrier(x)
    return x


def xmul(a, b) -> jnp.ndarray:
    """Product with C++ rounding semantics (no FMA contraction) in float64."""
    return _barrier64(a * b)


def xdiv(a, b) -> jnp.ndarray:
    """True division in float64 even when ``b`` is a compile-time constant."""
    res = a / _barrier64(jnp.asarray(b, jnp.asarray(a).dtype))
    return _barrier64(res)


def round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """C++ ``std::round``: round half away from zero.

    ``jnp.round`` rounds half to even, which diverges from the reference at
    .5 boundaries (used for Newton steps src/sift.cpp:401-403, octave coords
    src/sift.cpp:458-459, histogram bins src/sift.cpp:489, radii
    src/sift.cpp:463,636).
    """
    return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5))
