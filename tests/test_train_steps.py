"""Train-step smoke tests on tiny models (CPU, 8-device mesh) + checkpoint roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multishiftseg_tpu.losses.criterion import CriterionConfig
from multishiftseg_tpu.losses.rcl import RCLParams
from multishiftseg_tpu.models.deeplab import DeepWV3Plus
from multishiftseg_tpu.models.maskformer import MaskFormer
from multishiftseg_tpu.train.state import (
    TrainState, build_m2f_official_optimizer, build_stage_optimizer, trainable_mask,
)

TINY_TRUNK = dict(
    trunk_structure=(1, 1, 1, 1, 1, 1),
    trunk_channels=((8, 8), (8, 8), (16, 16), (16, 16), (8, 16, 32), (16, 32, 64)),
)


def _tiny_deeplab():
    model = DeepWV3Plus(num_classes=19, **TINY_TRUNK)
    img = jnp.zeros((2, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, img, train=False)
    return model, variables


@pytest.mark.slow
def test_trainable_mask_substring_semantics():
    _, variables = _tiny_deeplab()
    mask = trainable_mask(variables["params"], ("ood_head",))
    import flax

    flat = flax.traverse_util.flatten_dict(mask)
    on = [k for k, v in flat.items() if v]
    assert all("ood_head" in ".".join(k) for k in on)
    assert len(on) == 1  # just the ood head conv kernel
    mask_all = trainable_mask(variables["params"], (".",))
    assert all(flax.traverse_util.flatten_dict(mask_all).values())


def test_deeplab_train_step_updates_only_trainable():
    from multishiftseg_tpu.train.deeplab_trainer import make_train_step

    model, variables = _tiny_deeplab()
    tx, opt_state = build_stage_optimizer(
        variables["params"], lr=1e-2, weight_decay=1e-4, trainable_names=("ood_head",)
    )
    rcl = RCLParams(ce_weights=(1.0, 1.0),
                    inoutaug_contras_margins_tri=(1.0, 1.0, 1.0),
                    num_pair_samples=256)
    step = make_train_step(model, tx, rcl)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(4, 64, 64, 3).astype(np.float32))
    tgt = jnp.asarray(rng.randint(0, 19, (4, 64, 64)).astype(np.int32))
    tgt = tgt.at[:, 10:20, 10:20].set(254)

    import flax

    # snapshot before the step: the jitted step donates the state buffers
    old = {
        k: np.asarray(v)
        for k, v in flax.traverse_util.flatten_dict(variables["params"]).items()
    }
    old_bs_snap = {
        k: np.asarray(v)
        for k, v in flax.traverse_util.flatten_dict(variables["batch_stats"]).items()
    }

    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=opt_state, step=jnp.zeros((), jnp.int32),
                       rng=jax.random.PRNGKey(0))
    new_state, loss, aux = step(state, img, tgt)
    assert np.isfinite(float(loss))

    new = flax.traverse_util.flatten_dict(new_state.params)
    for k in old:
        changed = not np.allclose(np.asarray(old[k]), np.asarray(new[k]))
        if "ood_head" in ".".join(k):
            assert changed, k
        else:
            assert not changed, k
    # BN running stats must still update (reference keeps model.train())
    new_bs = flax.traverse_util.flatten_dict(new_state.batch_stats)
    assert any(
        not np.allclose(old_bs_snap[k], np.asarray(new_bs[k])) for k in old_bs_snap
    )


def _tiny_m2f():
    model = MaskFormer(num_classes=5, hidden_dim=64, num_queries=8, nheads=4,
                       dim_feedforward=128, dec_layers=3, mask_dim=64,
                       transformer_enc_layers=2)
    img = jnp.zeros((2, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, img, train=False)
    return model, variables


@pytest.mark.slow
def test_m2f_stage2_step_with_official_loss():
    from multishiftseg_tpu.losses.criterion import set_criterion

    model, variables = _tiny_m2f()
    tx, opt_state = build_m2f_official_optimizer(
        variables["params"], base_lr=1e-3, trainable_names=(".",)
    )
    cfg = CriterionConfig(num_classes=5, num_points=64, ood_loss="RCL")
    rcl = RCLParams(ce_weights=(0.0, 0.0),
                    inoutaug_contras_margins_tri=(0.7, 0.5, 0.2),
                    num_pair_samples=256)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    sem = jnp.asarray(rng.randint(0, 5, (2, 64, 64)).astype(np.int32))
    sem = sem.at[:, 30:40, 30:40].set(254)

    batch_stats = variables["batch_stats"]

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply({"params": p, "batch_stats": batch_stats}, img,
                              train=True)
            total, losses = set_criterion(out, sem, jax.random.PRNGKey(1), cfg, rcl)
            return total, losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
        return new_params, new_opt, loss

    new_params, _, loss = step(variables["params"], opt_state)
    assert np.isfinite(float(loss))
    import flax

    old = flax.traverse_util.flatten_dict(variables["params"])
    new = flax.traverse_util.flatten_dict(new_params)
    n_changed = sum(
        not np.allclose(np.asarray(old[k]), np.asarray(new[k])) for k in old
    )
    assert n_changed > len(old) * 0.5  # most params updated in stage 2


def test_checkpoint_roundtrip(tmp_path):
    from multishiftseg_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path))
    tree = {"params": {"w": np.arange(6.0).reshape(2, 3)}, "epoch": np.int64(7)}
    ckpt.save("best", **tree)
    assert ckpt.exists("best")
    restored = ckpt.restore("best", tree)
    np.testing.assert_array_equal(restored["params"]["w"], tree["params"]["w"])
    assert int(restored["epoch"]) == 7


@pytest.mark.slow
def test_instance_training_step_through_mappers():
    """Closing the mappers -> criterion loop end-to-end: a panoptic-style sample
    with duplicate classes goes mapper -> padded SegmentTargets ->
    set_criterion_instance -> grads through the vanilla-decoder MaskFormer."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from multishiftseg_tpu.data.mappers import SegmentTargets, instance_to_targets
    from multishiftseg_tpu.losses.criterion import (
        CriterionConfig, set_criterion_instance)
    from multishiftseg_tpu.models.maskformer import MaskFormer

    # instance-id map: ids >= divisor are instances (class = id // divisor)
    pan = np.zeros((64, 64), np.int64)
    pan[:, :20] = 2 * 1000 + 0   # class 2, instance 0
    pan[:, 40:] = 2 * 1000 + 1   # class 2, instance 1 (duplicate class)
    pan[10:30, 25:35] = 5 * 1000 + 0  # class 5
    tgt = instance_to_targets(pan, divisor=1000)
    assert len(tgt.classes) == 3 and (tgt.classes == 2).sum() == 2
    T = 6
    padded = tgt.padded(T)
    assert padded.classes.shape == (T,) and (padded.classes[3:] == -1).all()

    model = MaskFormer(num_classes=8, backbone="resnet50", hidden_dim=32,
                       num_queries=12, nheads=4, dim_feedforward=64,
                       dec_layers=3, mask_dim=32, transformer_enc_layers=1,
                       predictor="vanilla")
    img = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, img, train=False)
    cfg = CriterionConfig(num_classes=8, num_points=64, ood_loss="none",
                          mask_loss_with_pixel_selection=False,
                          deep_supervision=True)
    id_map = jnp.asarray(padded.id_map[None].astype(np.int32))
    classes = jnp.asarray(padded.classes[None].astype(np.int32))

    def loss_fn(params):
        out = model.apply({"params": params,
                           "batch_stats": variables["batch_stats"]}, img,
                          train=True)
        total, _ = set_criterion_instance(out, id_map, classes,
                                          jax.random.PRNGKey(1), cfg)
        return total

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.slow
def test_swin_stage1_step_runs():
    """Swin backbones have NO BatchNorm (batch_stats is None) and class_embed2
    is a weight COPY, not an alias: both used to break the donated stage-1 step
    (flax None-collection rejection; 'donate the same buffer twice')."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from multishiftseg_tpu.core.config import load_config
    from multishiftseg_tpu.models.maskformer import MaskFormer
    from multishiftseg_tpu.train.m2f_trainer import (TrainM2FOOD,
                                                     copy_class_embed_to_ood)
    from multishiftseg_tpu.train.state import TrainState, build_stage_optimizer

    cfg = load_config("/root/repo/exps/m2f_swin_tiny.yaml", exp_id="swin_step")
    cfg.data.crop_size = (64, 64)
    cfg.train.train_batch = 1
    cfg.train.bf16 = False
    model = MaskFormer(num_classes=19, backbone="swin_tiny", hidden_dim=32,
                       num_queries=12, nheads=4, dim_feedforward=64,
                       dec_layers=3, mask_dim=32, transformer_enc_layers=1)
    tr = TrainM2FOOD(cfg, model=model)
    assert tr.variables.get("batch_stats") is None
    tx, opt = build_stage_optimizer(tr.variables["params"], 1e-4, 1e-4,
                                    ("class_embed2",))
    state = TrainState(params=copy_class_embed_to_ood(tr.variables["params"]),
                       batch_stats=tr.variables.get("batch_stats"),
                       opt_state=opt, step=jnp.zeros((), jnp.int32),
                       rng=jax.random.PRNGKey(0))
    step = tr.make_stage1_step(tx, paired=False)
    img = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
    tgt = jnp.asarray(np.random.RandomState(1).randint(0, 19, (2, 64, 64)),
                      jnp.int32)
    state, loss, aux = step(state, img, tgt)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_swin_stage2_step_runs():
    """The official-loss stage-2 step (matcher + criterion + AdamW groups) with
    a Swin backbone: batch_stats is None through the whole donated step."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from multishiftseg_tpu.core.config import load_config
    from multishiftseg_tpu.models.maskformer import MaskFormer
    from multishiftseg_tpu.train.m2f_trainer import (TrainM2FOOD,
                                                     copy_class_embed_to_ood)
    from multishiftseg_tpu.train.state import (TrainState,
                                               build_m2f_official_optimizer)

    cfg = load_config("/root/repo/exps/m2f_swin_tiny.yaml", exp_id="swin_s2")
    cfg.data.crop_size = (64, 64)
    cfg.train.train_batch = 1
    cfg.train.bf16 = False
    cfg.model.m2f.train_num_points = 64
    model = MaskFormer(num_classes=19, backbone="swin_tiny", hidden_dim=32,
                       num_queries=24, nheads=4, dim_feedforward=64,
                       dec_layers=3, mask_dim=32, transformer_enc_layers=1)
    tr = TrainM2FOOD(cfg, model=model)
    tx, opt = build_m2f_official_optimizer(
        tr.variables["params"], base_lr=1e-4, weight_decay=0.05,
        clip_value=0.01, trainable_names=(".",))
    state = TrainState(params=copy_class_embed_to_ood(tr.variables["params"]),
                       batch_stats=tr.variables.get("batch_stats"),
                       opt_state=opt, step=jnp.zeros((), jnp.int32),
                       rng=jax.random.PRNGKey(0))
    step = tr.make_stage2_step(tx, paired=False)
    img = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
    tgt = np.random.RandomState(1).randint(0, 19, (2, 64, 64))
    tgt[:, :10, :10] = 254  # live OOD pixels
    state, loss, losses = step(state, img, jnp.asarray(tgt, jnp.int32))
    assert np.isfinite(float(loss))
