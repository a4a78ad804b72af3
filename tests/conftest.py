"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware, and with x64 enabled so the exact-mode
oracle matches the reference's double-precision semantics.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers the axon TPU plugin and
# pins JAX_PLATFORMS=axon; the config update (applied before any backend
# use) is the reliable way to run the test suite on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402
from pathlib import Path  # noqa: E402

REF = Path("/root/reference")


@pytest.fixture(scope="session")
def ref_example() -> Path:
    if not REF.exists():
        pytest.skip("reference checkout not available")
    return REF / "example"
