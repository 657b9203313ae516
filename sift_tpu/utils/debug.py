"""Numerical-safety tooling (the rebuild's answer to the reference's ASan
debug build, Makefile:6).

The reference's only correctness tool was AddressSanitizer; NaNs from its
unguarded divisions (src/sift.cpp:88-98, 586-597) propagate silently.  Here:

  - ``checked(fn)`` wraps a pipeline stage with jax.experimental.checkify to
    surface NaN/inf production and out-of-bounds indexing as errors.
  - ``assert_finite(tree)`` validates pipeline outputs host-side.
  - ``nan_debug()`` context manager flips jax_debug_nans for a scope.

Pallas kernels have their own interpreter mode for correctness work
(``interpret=True`` in ops/pallas_*).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify


def checked(fn, errors=None):
    """Wrap ``fn`` so NaN/inf/OOB inside raise instead of propagating.

    Returns a callable with the same signature; call ``.throw()`` semantics:
    the checkify error is raised eagerly on the host.
    """
    errors = errors or (checkify.float_checks | checkify.index_checks)
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_finite(tree, name: str = "output") -> None:
    """Host-side validation that every float leaf is finite where valid."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            raise FloatingPointError(
                f"{name}{jax.tree_util.keystr(path)} contains non-finite values"
            )


@contextlib.contextmanager
def nan_debug():
    """Enable jax_debug_nans within a scope (eager NaN localization)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
