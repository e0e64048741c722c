"""GPipe pipeline parallelism over a uniform layer stack.

The reference is single-process ``nn.DataParallel`` only (SURVEY.md §2.9) — it
has no pipeline parallelism. On TPU the natural pipelined unit in this
framework is the deformable encoder: ``transformer_enc_layers`` identical
``DeformableEncoderLayer`` blocks (``models/pixel_decoder.py``; reference
``modeling/pixel_decoder/msdeformattn.py`` runs 6 of them), the dominant cost
of the Mask2Former forward. Each pipeline stage owns a contiguous slice of the
stacked layer parameters — leaves live sharded over the mesh ``pipe`` axis, so
per-device parameter (and Adam-moment) memory scales as 1/P — and microbatches
flow stage-to-stage over ICI via ``lax.ppermute`` in the classic GPipe
schedule: ``n_micro + P - 1`` ticks, bubble fraction ``(P-1)/(n_micro+P-1)``.

Everything here is differentiable (``ppermute`` and ``shard_map`` have
transposes), so a full training step — loss through the pipelined stack,
grads, optimizer update on the stage-sharded parameters — jits end to end.
Equality (forward and grads) against the plain sequential layer loop is tested
in ``tests/test_pipeline.py``; ``__graft_entry__.dryrun_multichip`` runs a
dp x pp train step on the virtual mesh.

Checkpoint compatibility: on-disk layouts keep the reference's per-layer names
(``encoder_layer_0..N``); :func:`stack_layer_params` /
:func:`unstack_layer_params` convert to and from the stacked runtime layout,
so converted reference checkpoints pipeline without re-keying.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PIPE_AXIS = "pipe"


def make_pipe_mesh(num_devices: int, pipe: int) -> Mesh:
    """A ``(data, pipe)`` mesh: batch data-parallel over the first axis,
    pipeline stages over the second."""
    if num_devices % pipe:
        raise ValueError(f"{num_devices} devices not divisible by pipe={pipe}")
    devs = jax.devices()[:num_devices]
    import numpy as np

    return Mesh(np.asarray(devs).reshape(num_devices // pipe, pipe),
                ("data", PIPE_AXIS))


def stack_layer_params(params: Dict[str, Any], prefix: str, n_layers: int):
    """Stack the named per-layer subtrees ``params[f'{prefix}{i}']`` into one
    tree of ``[n_layers, ...]`` leaves (the runtime layout the pipeline
    shards; checkpoints keep the per-layer names)."""
    subs = [params[f"{prefix}{i}"] for i in range(n_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *subs)


def unstack_layer_params(stacked, prefix: str, n_layers: int) -> Dict[str, Any]:
    """Inverse of :func:`stack_layer_params` (for saving back to the named
    checkpoint layout)."""
    return {
        f"{prefix}{i}": jax.tree_util.tree_map(lambda x, i=i: x[i], stacked)
        for i in range(n_layers)
    }


def stage_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for stacked layer params: the layer axis over ``pipe`` (each
    stage holds its contiguous slice; everything else replicated)."""
    return NamedSharding(mesh, P(PIPE_AXIS))


def auto_microbatches(local_batch: int, pipe: int) -> int:
    """Default GPipe microbatch count: the largest divisor of the per-data-
    shard batch that is <= 2 * pipe. More microbatches shrink the bubble
    ((P-1)/(n_micro+P-1)) but shrink each microbatch's MXU tiles; 2P is the
    classic sweet spot when the batch allows it."""
    target = 2 * pipe
    best = 1
    for m in range(1, local_batch + 1):
        if local_batch % m == 0 and m <= target:
            best = m
    return best


def pack_encoder_stack(params: Dict[str, Any], n_layers: int,
                       scope: str = "pixel_decoder") -> Dict[str, Any]:
    """Convert a full model param tree from the on-disk / sequential layout
    (``pixel_decoder/encoder_layer_{i}`` named subtrees) to the pipeline
    runtime layout (one ``pixel_decoder/encoder_stack`` subtree of
    ``[n_layers, ...]`` leaves). Values are preserved exactly."""
    pd = dict(params[scope])
    pd["encoder_stack"] = stack_layer_params(pd, "encoder_layer_", n_layers)
    for i in range(n_layers):
        del pd[f"encoder_layer_{i}"]
    return {**params, scope: pd}


def unpack_encoder_stack(params: Dict[str, Any], n_layers: int,
                         scope: str = "pixel_decoder") -> Dict[str, Any]:
    """Inverse of :func:`pack_encoder_stack` (for saving interop checkpoints
    and for running the sequential eval path on pipeline-trained params)."""
    pd = dict(params[scope])
    pd.update(unstack_layer_params(pd.pop("encoder_stack"),
                                   "encoder_layer_", n_layers))
    return {**params, scope: pd}


def is_packed(params: Dict[str, Any], scope: str = "pixel_decoder") -> bool:
    return scope in params and "encoder_stack" in params[scope]


def gpipe(
    layer_apply: Callable[..., jax.Array],
    stacked_params,
    x: jax.Array,
    *,
    mesh: Mesh,
    n_micro: int,
    x_spec: P = P(),
    extras=(),
) -> jax.Array:
    """Run ``x`` through the stacked layers with the GPipe schedule.

    ``layer_apply(layer_params, state, *extras) -> state`` applies ONE layer.
    ``stacked_params``: a pytree with leading axis ``n_layers`` on every leaf
    (from :func:`stack_layer_params`), ``n_layers`` divisible by the ``pipe``
    axis size. ``x``: ``[B, ...]`` with ``B`` (the per-data-shard batch when
    ``x_spec`` shards it) divisible by ``n_micro``. ``x_spec``: partitioning
    of ``x`` over the mesh's OTHER axes (e.g. ``P('data')`` for dp x pp);
    ``x`` must be replicated over ``pipe``. ``extras``: batch-invariant
    tensors (pos encodings, reference points, ...) — passed as explicit
    replicated shard_map operands, NOT closure captures: closed-over traced
    values carry the outer (Auto) mesh's shardings into the Manual context,
    which jax rejects at the first broadcast.

    Returns the output batch, partitioned like ``x``. Differentiable.
    """
    pipe_n = mesh.shape[PIPE_AXIS]
    n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if n_layers % pipe_n:
        raise ValueError(f"{n_layers} layers not divisible by pipe={pipe_n}")
    # x rides the ring; it cannot be split over the pipe axis — check tuple-
    # composed entries too (PIPE_AXIS in P(('data', 'pipe')) is False)
    if any(a == PIPE_AXIS or (isinstance(a, tuple) and PIPE_AXIS in a)
           for a in (x_spec or ())):
        raise ValueError("x_spec must not shard over the pipe axis")

    def spmd(local_params, x_local, *extras_local):
        b_local = x_local.shape[0]
        if b_local % n_micro:
            raise ValueError(
                f"local batch {b_local} not divisible by n_micro={n_micro}")
        mb = b_local // n_micro
        xm = x_local.reshape(n_micro, mb, *x_local.shape[1:])
        p = jax.lax.axis_index(PIPE_AXIS)

        def stage(state):
            def body(c, lp):
                return layer_apply(lp, c, *extras_local), None

            out, _ = jax.lax.scan(body, state, local_params)
            return out

        def tick(carry, t):
            state, outbuf = carry
            # stage 0 ingests microbatch t (the clip re-feeds the last
            # microbatch during the drain ticks; its output is never emitted)
            t_in = jnp.clip(t, 0, n_micro - 1)
            fed = jnp.where(
                p == 0, jax.lax.dynamic_index_in_dim(xm, t_in, 0, False), state)
            out = stage(fed)
            # the last stage finishes microbatch t - (pipe_n - 1) this tick
            o_idx = t - (pipe_n - 1)
            oc = jnp.clip(o_idx, 0, n_micro - 1)
            valid = (p == pipe_n - 1) & (o_idx >= 0)
            cur = jax.lax.dynamic_index_in_dim(outbuf, oc, 0, False)
            outbuf = jax.lax.dynamic_update_index_in_dim(
                outbuf, jnp.where(valid, out, cur), oc, 0)
            # rotate stage p -> p + 1 over ICI
            nxt = jax.lax.ppermute(
                out, PIPE_AXIS, [(i, (i + 1) % pipe_n) for i in range(pipe_n)])
            return (nxt, outbuf), None

        # the carry varies over the pipe axis (each stage holds a different
        # in-flight microbatch) — mark the zero-init accordingly for shard_map's
        # varying-manual-axes type check
        state0 = jax.lax.pcast(jnp.zeros_like(xm[0]), (PIPE_AXIS,), to="varying")
        outbuf0 = jax.lax.pcast(jnp.zeros_like(xm), (PIPE_AXIS,), to="varying")
        (_, outbuf), _ = jax.lax.scan(
            tick, (state0, outbuf0), jnp.arange(n_micro + pipe_n - 1))
        # only the last stage holds real outputs; psum replicates them over
        # the pipe axis (out_spec asserts replication there)
        outbuf = jax.lax.psum(
            jnp.where(p == pipe_n - 1, outbuf, jnp.zeros_like(outbuf)), PIPE_AXIS)
        return outbuf.reshape(b_local, *x_local.shape[1:])

    return jax.shard_map(
        spmd, mesh=mesh,
        in_specs=(P(PIPE_AXIS), x_spec) + (P(),) * len(extras),
        out_specs=x_spec,
    )(stacked_params, x, *extras)


def gpipe_encoder_apply(
    layer_module,
    stacked_params,
    src: jax.Array,
    pos: jax.Array,
    reference_points: jax.Array,
    spatial_shapes,
    *,
    mesh: Mesh,
    n_micro: int,
    x_spec: P = P(),
    remat: bool = False,
    remat_policy=None,
) -> jax.Array:
    """Pipeline the deformable encoder stack: ``layer_module`` is an unbound
    ``DeformableEncoderLayer``; ``stacked_params`` from
    :func:`stack_layer_params` over the pixel decoder's
    ``encoder_layer_{i}`` subtrees. ``pos``/``reference_points`` are the
    batch-invariant extras ([1, S, ...] rows — broadcast inside).

    ``remat=True`` rematerializes each layer application in the backward
    (the pipelined analogue of the sequential path's per-layer ``nn.remat``
    — without it the gather VJP saves every layer's patch tensors);
    ``remat_policy`` e.g. ``save_only_these_names('deform_core')``."""
    if pos.shape[0] != 1 or reference_points.shape[0] != 1:
        # per-sample pos/ref (e.g. padding masks / valid ratios) would be
        # silently dropped by broadcasting row 0 — refuse instead
        raise ValueError(
            "gpipe_encoder_apply requires batch-invariant pos/reference_points "
            f"([1, S, ...]); got {pos.shape[0]=}, {reference_points.shape[0]=}")
    def layer_apply(lp, state, pos1, ref1):
        mb = state.shape[0]
        return layer_module.apply(
            {"params": lp}, state,
            jnp.broadcast_to(pos1, (mb,) + pos1.shape[1:]),
            jnp.broadcast_to(ref1, (mb,) + ref1.shape[1:]),
            spatial_shapes,
        )

    if remat:
        layer_apply = jax.checkpoint(layer_apply, policy=remat_policy)
    return gpipe(layer_apply, stacked_params, src, mesh=mesh, n_micro=n_micro,
                 x_spec=x_spec, extras=(pos, reference_points))
