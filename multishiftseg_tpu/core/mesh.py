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
# must match core.pipeline.PIPE_AXIS (defined there to keep pipeline.py
# self-contained; asserted equal in tests/test_pipeline.py)
PIPE_AXIS = "pipe"


def make_mesh(
    num_devices: int = 0,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    pipeline_parallel: int = 1,
) -> Mesh:
    """Create a 2-D (data, model) mesh over the local devices — or a 3-D
    (data, model, pipe) mesh when ``pipeline_parallel > 1``.

    Args:
      num_devices: total devices to use; 0 means all of ``jax.devices()``.
      model_parallel: size of the model axis (1 = pure data parallelism).
      devices: explicit device list (for tests with CPU meshes).
      pipeline_parallel: size of the pipe axis (GPipe stages, core/pipeline.py).
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
    groups = model_parallel * pipeline_parallel
    if n % groups != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel}"
            + (f" x pipeline_parallel={pipeline_parallel}"
               if pipeline_parallel > 1 else ""))
    if pipeline_parallel > 1:
        grid = np.asarray(devs).reshape(
            n // groups, model_parallel, pipeline_parallel)
        return Mesh(grid, (DATA_AXIS, MODEL_AXIS, PIPE_AXIS))
    grid = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def spatial_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the HEIGHT axis (axis 1 of an NHWC batch) over the data axis —
    whole-image eval partitioned *spatially* across the mesh.

    This is the SURVEY §5 "long-context" analogue for a vision model: the
    sequence axis is the pixel grid of one 1024x2048 image, and scaling past
    one chip means splitting that grid, not the batch. Under jit XLA SPMD
    inserts halo exchanges for convolutions and collectives for cross-row
    reductions (ASPP global pooling, interpolation-matrix resizes, attention
    over flattened tokens), so the partitioned forward is numerically
    identical to the single-device one (tested on the virtual CPU mesh);
    parameters stay replicated. Use for single-image latency scaling —
    batch-axis data parallelism (:func:`data_sharded`) remains the
    throughput-optimal layout when images can be batched."""
    return NamedSharding(mesh, P(None, DATA_AXIS, *([None] * (ndim - 2))))


def tensor_parallel_shardings(params, mesh: Mesh, min_size: int = 1024):
    """Per-leaf shardings for TENSOR parallelism over the ``model`` axis.

    Shards the trailing (output-channel) dimension of every large kernel —
    conv HWIO kernels, dense [in, out] kernels, and their per-channel
    bias/scale/stat vectors — across ``model``; everything smaller stays
    replicated. The WRN-38 trunk's 4096-channel mod6/7 stages and the M2F
    pixel-decoder projections are the intended targets (SURVEY §2.9's TP row:
    the reference has no TP of any kind). XLA SPMD then partitions the
    matmuls/convs along the channel contraction and inserts the collectives;
    the forward is numerically identical to the replicated one (tested on the
    virtual CPU mesh, ``tests/test_mesh.py``).

    Memory: sharded leaves live 1/model-size per device in HBM — with Adam
    this also shards both moment tensors, since ``tx.init`` on sharded params
    inherits their placement.
    """
    msize = mesh.shape[MODEL_AXIS]
    has_pipe = PIPE_AXIS in mesh.axis_names

    def rule(path, x):
        # pipeline-stacked encoder params (and their Adam moments, whose optax
        # state trees carry the same dict paths): leading layer axis over pipe
        if has_pipe and any(
                getattr(k, "key", None) == "encoder_stack" for k in path):
            # exactly the gpipe shard_map's in_spec (P(pipe) and nothing
            # else): adding model-axis sharding here would force an
            # all-gather at the shard_map boundary every step
            return NamedSharding(mesh, P(PIPE_AXIS))
        if (msize > 1 and hasattr(x, "shape") and x.ndim >= 1
                and x.shape[-1] >= min_size and x.shape[-1] % msize == 0):
            return NamedSharding(
                mesh, P(*([None] * (x.ndim - 1) + [MODEL_AXIS])))
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(variables, mesh: Mesh, min_size: int = 1024):
    """Place a variables pytree onto the mesh under
    :func:`tensor_parallel_shardings` (replicated when the model axis is 1)."""
    return jax.tree_util.tree_map(
        jax.device_put, variables,
        tensor_parallel_shardings(variables, mesh, min_size))


def place_train_state(state, mesh: Mesh, min_size: int = 1024):
    """Place a TrainState (any pytree) on the mesh: tensor-parallel shardings
    when the model axis > 1 — the shape rule covers params, their Adam
    moments, and BN stats alike — plain replication otherwise (model axis 1
    makes this exactly ``device_put(state, replicated(mesh))``).

    Multi-process: ``device_put`` of an array already committed to a local
    device onto a GLOBAL sharding is a cross-host transfer, which the CPU/TPU
    backends reject ("does not support cross-host device transfers") — so
    leaves go through host buffers first. Every process holds identical values
    (same seeded init / same restored checkpoint), so the host round-trip is
    correct; it happens once per training run.
    """
    shardings = tensor_parallel_shardings(state, mesh, min_size)
    if jax.process_count() > 1:
        state = jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, state)
    return jax.device_put(state, shardings)


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


def fit_mesh_to_batch(global_batch: int, num_devices: int = 0,
                      model_parallel: int = 1,
                      pipeline_parallel: int = 1) -> Mesh:
    """(data, model[, pipe]) mesh whose data axis is the largest count that
    divides the global batch, over ``model_parallel x pipeline_parallel``-sized
    model groups."""
    groups = model_parallel * pipeline_parallel
    n = (num_devices or len(jax.devices())) // groups
    while n > 1 and global_batch % n != 0:
        n -= 1
    return make_mesh(num_devices=n * groups,
                     model_parallel=model_parallel,
                     pipeline_parallel=pipeline_parallel)


def make_train_mesh(half_rows: int, num_devices: int = 0,
                    model_parallel: int = 1,
                    pipeline_parallel: int = 1) -> Mesh:
    """The trainers' mesh, sized for the PAIRED [clean ‖ augmented] batch.

    ``half_rows`` is one half (``cfg.train.train_batch``). Single-process: the
    halves are concatenated on host, so the data axis fits the full ``2 *
    half_rows`` paired batch (all local devices up to that size — devices are
    never idled when ``device_count <= 2 * half_rows``). Multi-process: the
    halves are fed as separate global arrays and concatenated inside jit (a
    host-side concat would interleave the halves per host), so the global data
    axis must divide ONE half — refuse otherwise (silent truncation would
    desynchronize the hosts' jit programs)."""
    if jax.process_count() > 1:
        if pipeline_parallel > 1:
            raise ValueError(
                "pipeline_parallel > 1 is single-process only: the GPipe ring "
                "(ppermute per tick) must ride ICI, not DCN")
        mesh = make_global_mesh(model_parallel=model_parallel)
        n = mesh.shape[DATA_AXIS]
        if half_rows % n != 0:
            raise ValueError(
                f"per-half batch rows {half_rows} not divisible by the global "
                f"data axis ({n} devices over {jax.process_count()} hosts)"
            )
        return mesh
    return fit_mesh_to_batch(2 * half_rows, num_devices, model_parallel,
                             pipeline_parallel)


def default_device_count(requested: int = 0) -> int:
    if requested:
        return requested
    env = os.environ.get("MSS_NUM_DEVICES")
    return int(env) if env else len(jax.devices())


# ---------------------------------------------------------------------------
# Multi-host (multi-slice / DCN) support
# ---------------------------------------------------------------------------


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join a multi-host JAX runtime (SURVEY §2.9's DP target beyond one host).

    On TPU pods the arguments auto-detect from the environment; on CPU/GPU
    clusters pass them (or set ``JAX_COORDINATOR_ADDRESS`` etc.). After this,
    ``jax.devices()`` is GLOBAL and :func:`make_global_mesh` lays the data axis
    out host-major, so per-step gradient all-reduce crosses DCN once while
    within-host reduction rides ICI. Safe to call on a single process (no-op).
    """
    if jax.process_count() > 1:
        return  # already initialized
    explicit = coordinator_address is not None or num_processes is not None
    # a pod/cluster launch is detectable from the environment even with no
    # explicit args — jax.distributed.initialize() then auto-configures; with
    # neither args nor any of these markers, this is a plain single-process
    # run and initialize() would fail, so no-op. TPU_WORKER_HOSTNAMES counts
    # only with MULTIPLE workers (single-host tunnels set it to 'localhost').
    pod_env = any(os.environ.get(k) for k in (
        "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS",
    )) or "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if not (explicit or pod_env):
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if explicit:
            raise
        # auto-detection misfired (e.g. backend already up on a dev machine
        # whose env mimics a pod) — continue single-process rather than die
        import logging

        logging.getLogger(__name__).warning(
            "jax.distributed.initialize auto-detect failed (%s); "
            "continuing single-process", e)


def make_global_mesh(model_parallel: int = 1) -> Mesh:
    """(data, model) mesh over ALL processes' devices, host-major on the data axis.

    Host-major layout means each host's addressable devices are contiguous along
    ``data``: batch shards stay host-local (each host feeds its own devices via
    :func:`local_batch_slice`) and the model axis never crosses DCN.
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devs)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    if model_parallel > 1 and len(jax.local_devices()) % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} would span hosts "
            f"({len(jax.local_devices())} local devices) — the model axis must "
            f"stay on ICI"
        )
    grid = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def local_batch_slice(global_batch: int) -> slice:
    """This process's contiguous slice of the global batch under the host-major
    mesh (each host loads only its own shard — the multi-host loader contract)."""
    per = global_batch // jax.process_count()
    assert per * jax.process_count() == global_batch, (
        global_batch, jax.process_count())
    return slice(jax.process_index() * per, (jax.process_index() + 1) * per)


def shard_global_batch(batch, mesh: Mesh):
    """Assemble a globally-sharded array from per-host local shards.

    Each process passes ITS slice (``local_batch_slice``) of the global batch;
    the result is one global jax.Array batch-sharded over ``data`` — the
    multi-host analogue of :func:`shard_batch`.
    """
    sharding_for = lambda x: data_sharded(mesh, np.asarray(x).ndim)

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding_for(x), x, global_shape
        )

    return jax.tree_util.tree_map(put, batch)
