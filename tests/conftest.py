"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use
``--xla_force_host_platform_device_count=8`` as recommended for jax.sharding testing.
Must set env vars before jax is imported anywhere.
"""

import os

# Force CPU: the environment pins JAX_PLATFORMS=axon (the TPU tunnel), which
# serializes concurrent test runs on one chip; tests must use the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
