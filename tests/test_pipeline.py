"""GPipe pipeline parallelism: equality (forward + grads) vs the sequential
layer loop, on the real DeformableEncoderLayer stack.

The reference has no pipeline parallelism (SURVEY.md §2.9 — single-process
``nn.DataParallel`` only); ``core/pipeline.py`` is a beyond-reference
parallelism surface, so its oracle is this framework's own sequential layer
loop (the path every golden-parity test already validates against torch).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from multishiftseg_tpu.core.pipeline import (
    PIPE_AXIS, gpipe, gpipe_encoder_apply, make_pipe_mesh, stack_layer_params,
    stage_sharding, unstack_layer_params,
)
from multishiftseg_tpu.models.pixel_decoder import (
    DeformableEncoderLayer, _reference_points,
)

N_LAYERS = 4
SHAPES = ((4, 6), (2, 3))
D = 32


def _build_stack(batch: int):
    layer = DeformableEncoderLayer(d_model=D, d_ffn=64, n_levels=len(SHAPES),
                                   n_heads=2, n_points=2)
    S = sum(h * w for h, w in SHAPES)
    src = jax.random.normal(jax.random.PRNGKey(0), (batch, S, D))
    pos = jax.random.normal(jax.random.PRNGKey(1), (1, S, D))
    ref = jnp.broadcast_to(
        jnp.asarray(_reference_points(SHAPES))[None, :, None, :],
        (1, S, len(SHAPES), 2))
    params = {
        f"encoder_layer_{i}": layer.init(
            jax.random.PRNGKey(10 + i), src[:1],
            pos, jnp.broadcast_to(ref, (1,) + ref.shape[1:]), SHAPES,
        )["params"]
        for i in range(N_LAYERS)
    }
    return layer, params, src, pos, ref


def _sequential(layer, params, src, pos, ref):
    b = src.shape[0]
    pos_b = jnp.broadcast_to(pos, (b,) + pos.shape[1:])
    ref_b = jnp.broadcast_to(ref, (b,) + ref.shape[1:])
    for i in range(N_LAYERS):
        src = layer.apply({"params": params[f"encoder_layer_{i}"]},
                          src, pos_b, ref_b, SHAPES)
    return src


def test_stack_roundtrip():
    _, params, _, _, _ = _build_stack(1)
    stacked = stack_layer_params(params, "encoder_layer_", N_LAYERS)
    lead = {l.shape[0] for l in jax.tree_util.tree_leaves(stacked)}
    assert lead == {N_LAYERS}
    back = unstack_layer_params(stacked, "encoder_layer_", N_LAYERS)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("pipe,n_micro,dp", [(4, 2, True), (2, 3, False)])
def test_gpipe_forward_matches_sequential(pipe, n_micro, dp):
    layer, params, src, pos, ref = _build_stack(batch=6 if not dp else 8)
    want = np.asarray(_sequential(layer, params, src, pos, ref))

    mesh = make_pipe_mesh(8 if dp else pipe, pipe=pipe)
    stacked = jax.device_put(
        stack_layer_params(params, "encoder_layer_", N_LAYERS),
        stage_sharding(mesh))
    x_spec = P("data") if dp else P()
    src_d = jax.device_put(src, NamedSharding(mesh, x_spec))

    got = jax.jit(
        lambda sp, x: gpipe_encoder_apply(
            layer, sp, x, pos, ref, SHAPES,
            mesh=mesh, n_micro=n_micro, x_spec=x_spec)
    )(stacked, src_d)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_gpipe_train_step_grads_match_sequential():
    """A full pp training step differentiates: grads w.r.t. the stage-sharded
    stacked params equal the sequential loop's grads (stacked)."""
    layer, params, src, pos, ref = _build_stack(batch=8)
    w = jax.random.normal(jax.random.PRNGKey(5), src.shape)

    mesh = make_pipe_mesh(8, pipe=4)
    stacked = stack_layer_params(params, "encoder_layer_", N_LAYERS)
    stacked_d = jax.device_put(stacked, stage_sharding(mesh))
    src_d = jax.device_put(src, NamedSharding(mesh, P("data")))

    def pp_loss(sp, x):
        out = gpipe_encoder_apply(layer, sp, x, pos, ref, SHAPES,
                                  mesh=mesh, n_micro=2, x_spec=P("data"))
        return jnp.sum(out * w)

    def seq_loss(sp, x):
        named = unstack_layer_params(sp, "encoder_layer_", N_LAYERS)
        return jnp.sum(_sequential(layer, named, x, pos, ref) * w)

    pp_l, pp_g = jax.jit(jax.value_and_grad(pp_loss))(stacked_d, src_d)
    sq_l, sq_g = jax.jit(jax.value_and_grad(seq_loss))(stacked, src)
    np.testing.assert_allclose(float(pp_l), float(sq_l), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(pp_g),
                    jax.tree_util.tree_leaves(sq_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    # ...and an optimizer update applies on the sharded layout
    import optax

    tx = optax.adam(1e-3)
    opt = tx.init(stacked_d)
    upd, _ = jax.jit(tx.update)(pp_g, opt, stacked_d)
    new = jax.jit(optax.apply_updates)(stacked_d, upd)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(new))


def test_gpipe_rejects_bad_geometry():
    layer, params, src, pos, ref = _build_stack(batch=4)
    stacked = stack_layer_params(params, "encoder_layer_", N_LAYERS)
    mesh = make_pipe_mesh(8, pipe=4)
    with pytest.raises(ValueError, match="n_micro"):
        jax.jit(lambda sp, x: gpipe_encoder_apply(
            layer, sp, x, pos, ref, SHAPES, mesh=mesh, n_micro=3))(stacked, src)
    mesh3 = None
    try:
        mesh3 = make_pipe_mesh(6, pipe=3)
    except Exception:
        pass
    if mesh3 is not None:
        with pytest.raises(ValueError, match="divisible by pipe"):
            gpipe(lambda lp, s: s, stacked, src, mesh=mesh3, n_micro=2)
    with pytest.raises(ValueError, match="pipe axis"):
        gpipe(lambda lp, s: s, stacked, src, mesh=mesh, n_micro=2,
              x_spec=P(PIPE_AXIS))
