"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use
``--xla_force_host_platform_device_count=8`` as recommended for jax.sharding testing.
Must set env vars before jax is imported anywhere.
"""

import os

# Force CPU: the environment pins JAX_PLATFORMS=axon (the TPU tunnel), which
# serializes concurrent test runs on one chip; tests must use the virtual CPU mesh.
# A site hook imports jax at interpreter startup, latching the env var — so update the
# live config too (backend init is lazy, this still takes effect).
os.environ["JAX_PLATFORMS"] = "cpu"
# Verify the deformable op's PROMISE_IN_BOUNDS invariant throughout the suite
# (env-gated runtime bounds checks on every gather/scatter index set).
os.environ.setdefault("MSS_DEBUG_BOUNDS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
