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
TEST_PLATFORM = os.environ.get("FDSD_TEST_PLATFORM", "cpu")
ON_TPU = TEST_PLATFORM == "axon"
jax.config.update("jax_platforms", TEST_PLATFORM)

# Parity tests run in fp32: disable XLA's default bf16 matmul downcast.
jax.config.update("jax_default_matmul_precision", "highest")
# Persist compiled executables across test runs — CPU compiles dominate
# suite wall-clock otherwise.  The TPU tier shares bench.py's cache so
# remote compiles are amortized across bench and tests.
cache_dir = "/tmp/fdsd_tpu_cache" if ON_TPU else "/tmp/fdsd_jax_cache"
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """`tpu`-marked tests need the real chip: run them with
    FDSD_TEST_PLATFORM=axon pytest -m tpu (they skip on the CPU backend)."""
    skip_tpu = pytest.mark.skip(
        reason="real-TPU test: set FDSD_TEST_PLATFORM=axon")
    skip_cpu = pytest.mark.skip(
        reason="fake-device test: not meaningful on the 1-chip TPU backend")
    for item in items:
        has_tpu = "tpu" in item.keywords
        if has_tpu and not ON_TPU:
            item.add_marker(skip_tpu)
        if not has_tpu and ON_TPU:
            item.add_marker(skip_cpu)


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 fake devices, got {devs}"
    return devs[:8]
