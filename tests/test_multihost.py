"""Multi-host bring-up helpers on the simulated device fleet."""

from __future__ import annotations

import jax

from sift_tpu.parallel.multihost import fleet_barrier, initialize


def test_initialize_idempotent_single_process():
    initialize()  # no coordinator -> single-process no-op
    initialize()
    assert jax.process_count() == 1


def test_fleet_barrier_counts_devices():
    assert fleet_barrier() == jax.device_count()
