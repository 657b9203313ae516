"""Test harness: CPU backend with 8 virtual devices + x64 for parity tests.

Multi-chip sharding tests use the standard JAX trick of simulating an
N-device mesh on CPU (same code path as real ICI); parity tests need f64 to
match the C++ reference bit-for-bit.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# The axon remote-compile helper produces CPU AOT artifacts with host-feature
# mismatches (SIGILL risk when loaded from the persistent cache); compile
# locally for tests.
os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# Bit-parity with the C++ oracle: XLA CPU's fusion emitter contracts mul+add
# chains through llvm.fmuladd, changing the last ulp vs the reference build
# (no FMA at baseline x86-64).  Disabling the fusion pass restores separate
# roundings; together with sift_tpu.utils.numerics.xdiv (true division) the
# f64 pipeline reproduces the oracle bit-for-bit.
if "xla_disable_hlo_passes" not in flags:
    flags += " --xla_disable_hlo_passes=fusion"
os.environ["XLA_FLAGS"] = flags.strip()

import jax

# The environment pins JAX_PLATFORMS=axon (remote TPU tunnel); the config
# update below is the only override that sticks.  Tests run on real local CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# XLA-CPU compiles are slow on this machine; cache compiled executables
# across test runs.
os.makedirs("/root/.cache/jax_test_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _release_executables_between_modules():
    """Drop live compiled executables after each test module.

    The suite compiles hundreds of XLA-CPU programs; keeping them all loaded
    eventually segfaults the compiler mid-build (JIT code mappings exhaust).
    The persistent disk cache makes re-loading cheap.
    """
    yield
    jax.clear_caches()
    gc.collect()
