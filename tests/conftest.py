"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding paths are exercised on a virtual CPU mesh (the driver
separately dry-runs the multichip path); the real TPU is reserved for
bench.py.
"""

import os

# Force CPU regardless of the ambient environment. NOTE: the axon TPU
# plugin (sitecustomize) sets jax_platforms programmatically, so the env
# var alone is NOT enough — override via jax.config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_DIR = os.environ.get("MAZU_REFERENCE_DIR", "/root/reference")
TEST_DATA = os.path.join(REFERENCE_DIR, "test_data")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def test_data_dir():
    if not os.path.isdir(TEST_DATA):
        pytest.skip("reference test_data not available")
    return TEST_DATA
