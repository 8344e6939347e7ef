"""Test harness: force an 8-device CPU backend before JAX initializes.

This is the standard JAX fake-backend trick (SURVEY.md §4f): multi-chip
sharding tests run against a virtual 8-device mesh on CPU, no TPU pod needed.
bench.py / production runs are unaffected (they never import this).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (TPU tunnel) at interpreter startup,
# so the env-var route is overridden; the config route always wins as long as
# no backend has been touched yet.
jax.config.update("jax_platforms", os.environ.get("FDSD_TEST_PLATFORM", "cpu"))

# Parity tests run in fp32: disable XLA's default bf16 matmul downcast.
jax.config.update("jax_default_matmul_precision", "highest")
# Persist compiled executables across test runs — CPU compiles dominate
# suite wall-clock otherwise.
os.makedirs("/tmp/fdsd_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/fdsd_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 fake devices, got {devs}"
    return devs[:8]
