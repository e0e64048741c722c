"""Device mesh and sharding setup.

The reference parallelizes with ``torch.nn.DataParallel`` (replicate + scatter/gather
per step; ``train_deeplab.py:90-91``). The TPU-native replacement is a persistent
``jax.sharding.Mesh`` with parameters replicated in HBM and the batch sharded over the
``data`` axis; gradient all-reduce rides ICI via the ``psum`` XLA inserts under ``jit``.

A second ``model`` axis is provisioned for tensor-parallel sharding of the widest
layers (WRN-38's 4096-channel mod6/7, the M2F pixel decoder) on larger slices.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    num_devices: int = 0,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a 2-D (data, model) mesh over the local devices.

    Args:
      num_devices: total devices to use; 0 means all of ``jax.devices()``.
      model_parallel: size of the model axis (1 = pure data parallelism).
      devices: explicit device list (for tests with CPU meshes).
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices:
        if len(devs) < num_devices:
            raise ValueError(
                f"make_mesh(num_devices={num_devices}) but only {len(devs)} devices "
                f"available ({[d.platform for d in devs]}); refusing to silently "
                f"truncate — a smaller mesh would not test the requested sharding"
            )
        devs = devs[:num_devices]
    n = len(devs)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh):
    """Place a host pytree of arrays onto the mesh, batch-sharded on axis 0."""
    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, data_sharded(mesh, x.ndim))
    return jax.tree_util.tree_map(put, batch)


def host_cpu_mesh(n: int = 8) -> Mesh:
    """Virtual CPU mesh for sharding tests (requires
    XLA_FLAGS=--xla_force_host_platform_device_count=<n> set before jax import)."""
    cpus = jax.devices("cpu")
    return make_mesh(devices=cpus[:n])


def fit_mesh_to_batch(global_batch: int, num_devices: int = 0) -> Mesh:
    """Data mesh over the largest device count that divides the global batch."""
    n = num_devices or len(jax.devices())
    while n > 1 and global_batch % n != 0:
        n -= 1
    return make_mesh(num_devices=n)


def default_device_count(requested: int = 0) -> int:
    if requested:
        return requested
    env = os.environ.get("MSS_NUM_DEVICES")
    return int(env) if env else len(jax.devices())
