"""Multi-host bring-up and fleet health.

On a real pod slice every host runs the same program;
``jax.distributed.initialize`` wires the hosts into one system and the
meshes in parallel/mesh.py then span all hosts' devices (collectives ride
ICI within a slice, DCN across slices).  The reference has no distributed
story at all (single thread, src/main.cpp); this module is the bring-up +
failure-detection layer of the TPU design:

  - ``initialize(...)``: idempotent jax.distributed bring-up from env or
    explicit coordinator settings.
  - ``fleet_barrier()``: cheap all-host liveness check (a psum over every
    device) — the heartbeat primitive; a dead host surfaces as a timeout
    here rather than a hang deep in a collective.
  - Recovery: on failure, relaunch with the surviving hosts and resume from
    checkpoints (utils/checkpoint.py); tests/test_elastic.py exercises the
    degrade-and-recompute path on a simulated mesh.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_initialized = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Idempotent jax.distributed.initialize (env-driven when args omitted).

    Environment fallbacks: JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID (also auto-detected on Cloud TPU pods).
    """
    # NOTE: must not touch any jax API that instantiates a backend (e.g.
    # jax.process_count()) before jax.distributed.initialize — initialize
    # raises if a backend already exists.  Idempotency is tracked purely by
    # the module flag.
    global _initialized
    if _initialized:
        return
    kwargs = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kwargs["coordinator_address"] = addr
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if kwargs:
        # Tolerate an already-initialized backend/distributed service (a
        # launcher may have initialized before us), same as the
        # auto-detection branch below.
        try:
            jax.distributed.initialize(**kwargs)
        except RuntimeError:
            pass
    elif os.environ.get("TPU_WORKER_HOSTNAMES"):
        # Pod auto-detection; tolerate single-process/debug environments
        # (backend already up -> RuntimeError; no derivable coordinator ->
        # ValueError).
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError):
            pass
    _initialized = True


def fleet_barrier(timeout_note: str = "") -> int:
    """All-device liveness probe: psum(1) over every visible device.

    Returns the global device count on success; a missing host makes this
    call block/timeout, which is the failure-detection signal multi-host
    drivers act on (drop to the surviving mesh + resume from checkpoints).
    """
    # pmap maps over *local* devices only; psum over the named axis still
    # reduces across every process, so the result is the global count.
    n = jax.local_device_count()
    x = jnp.ones((n,))
    out = jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x)
    return int(np.asarray(out)[0])
