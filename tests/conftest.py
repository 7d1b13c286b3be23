"""Test harness config: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware (SURVEY.md §4)."""

import os

# Must run before the first jax backend use. The container's sitecustomize pins
# JAX_PLATFORMS=axon (the tunneled TPU) and imports jax at interpreter start, so
# plain env-var edits here are too late — go through jax.config instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    import jax

    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs
