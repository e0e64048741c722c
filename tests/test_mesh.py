"""Mesh construction, multi-host helpers (single-process semantics on the
8-virtual-device CPU mesh), and the truncation guard."""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from multishiftseg_tpu.core import mesh as M


def test_make_mesh_refuses_truncation():
    with pytest.raises(ValueError):
        M.make_mesh(num_devices=len(jax.devices()) + 1)


def test_make_mesh_model_axis():
    m = M.make_mesh(num_devices=8, model_parallel=2)
    assert m.shape == {"data": 4, "model": 2}


def test_global_mesh_single_process():
    m = M.make_global_mesh()
    assert len(m.devices.flatten()) == len(jax.devices())
    assert m.axis_names == ("data", "model")
    # model axis spanning more than the local device count is rejected
    with pytest.raises(ValueError):
        M.make_global_mesh(model_parallel=len(jax.local_devices()) * 2)


def test_initialize_distributed_noop_single_process():
    M.initialize_distributed()  # must not raise or re-init


def test_local_batch_slice_and_global_shard():
    assert M.local_batch_slice(16) == slice(0, 16)
    m = M.make_global_mesh()
    batch = {"img": np.arange(8 * 4, dtype=np.float32).reshape(8, 4),
             "tgt": np.arange(8, dtype=np.int32)}
    local = {k: v[M.local_batch_slice(8)] for k, v in batch.items()}
    global_batch = M.shard_global_batch(local, m)
    assert global_batch["img"].shape == (8, 4)
    assert global_batch["img"].sharding.spec == P("data", None)
    np.testing.assert_array_equal(np.asarray(global_batch["img"]), batch["img"])
    np.testing.assert_array_equal(np.asarray(global_batch["tgt"]), batch["tgt"])
    # a jitted mean over the sharded batch reduces across the mesh
    total = jax.jit(lambda b: b["img"].sum() + b["tgt"].sum())(global_batch)
    assert float(total) == batch["img"].sum() + batch["tgt"].sum()
