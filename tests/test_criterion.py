"""Set criterion: component sanity + jit/grad on tiny shapes."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from multishiftseg_tpu.losses.criterion import (
    CriterionConfig,
    sample_class_points,
    sample_target_points,
    set_criterion,
)
from multishiftseg_tpu.losses.rcl import RCLParams


def test_sample_target_points_equals_onehot_gridsample(rng):
    """Corner-label sampling == grid_sample of the materialized one-hot masks."""
    k = 4
    labels = rng.randint(0, 6, size=(2, 9, 13))  # includes ids >= k (ignored classes)
    coords = rng.rand(2, 30, 2).astype(np.float32)
    ours = np.asarray(
        sample_target_points(jnp.asarray(labels), jnp.asarray(coords), k)
    )
    onehot = np.stack([(labels == c).astype(np.float32) for c in range(k)], 1)  # [B,K,H,W]
    ref = (
        F.grid_sample(
            torch.from_numpy(onehot),
            (2 * torch.from_numpy(coords) - 1).unsqueeze(2),
            mode="bilinear", padding_mode="zeros", align_corners=False,
        )
        .squeeze(-1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
    one = np.asarray(
        sample_class_points(jnp.asarray(labels), jnp.asarray(coords), jnp.asarray([2, 3]))
    )
    np.testing.assert_allclose(one[0], ref[0, 2], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(one[1], ref[1, 3], rtol=1e-5, atol=1e-6)


def _tiny_outputs(rng, b=4, q=8, k=5, hs=16, ws=16):
    return {
        "pred_logits": jnp.asarray(rng.randn(b, q, k + 1).astype(np.float32)),
        "pred_masks": jnp.asarray(rng.randn(b, q, hs, ws).astype(np.float32)),
        "pred_logits_ood": jnp.asarray(rng.randn(b, q, k + 1).astype(np.float32)),
        "pred_masks_ood": jnp.asarray(rng.randn(b, q, hs, ws).astype(np.float32)),
    }


def _tiny_sem(rng, b=4, h=64, w=64, k=5):
    sem = rng.randint(0, k, size=(b, h, w)).astype(np.int32)
    sem[:, 20:30, 20:30] = 254  # OOD blob
    sem[:, :4] = 255  # void
    return jnp.asarray(sem)


@pytest.mark.parametrize("ood_loss", ["margin", "bce", "RCL"])
def test_criterion_runs_and_is_finite(rng, ood_loss):
    cfg = CriterionConfig(num_classes=5, num_points=64, ood_loss=ood_loss)
    outputs = _tiny_outputs(rng)
    sem = _tiny_sem(rng)
    rcl = RCLParams(ce_weights=(0.0, 0.0), inoutaug_contras_margins_tri=(0.7, 0.5, 0.2))
    total, losses = jax.jit(
        lambda o, s: set_criterion(o, s, jax.random.PRNGKey(0), cfg, rcl)
    )(outputs, sem)
    assert np.isfinite(float(total))
    for k_, v in losses.items():
        assert np.isfinite(float(v)), k_
    expected = {"loss_ce", "loss_original_mask", "loss_original_dice",
                "loss_aug_mask", "loss_aug_dice", "loss_ood"}
    assert expected == set(losses.keys())


def test_criterion_gradients_flow(rng):
    cfg = CriterionConfig(num_classes=5, num_points=64, ood_loss="RCL")
    outputs = _tiny_outputs(rng)
    sem = _tiny_sem(rng)
    rcl = RCLParams(ce_weights=(1.0, 1.0), inoutaug_contras_margins_tri=(0.7, 0.5, 0.2))

    def f(o):
        total, _ = set_criterion(o, sem, jax.random.PRNGKey(0), cfg, rcl)
        return total

    g = jax.grad(f)(outputs)
    for name in ("pred_logits", "pred_masks", "pred_logits_ood", "pred_masks_ood"):
        arr = np.asarray(g[name])
        assert np.isfinite(arr).all(), name
        assert np.abs(arr).sum() > 0, name


def test_perfect_prediction_has_low_mask_loss(rng):
    """Queries that exactly predict the class masks should yield near-zero mask/dice."""
    k, b, h, w = 3, 2, 32, 32
    sem = np.zeros((b, h, w), np.int32)
    sem[:, :, 10:20] = 1
    sem[:, :, 20:] = 2
    q = 8
    # query i predicts mask of class i with +-10 logits
    masks = np.full((b, q, h, w), -10.0, np.float32)
    logits = np.full((b, q, k + 1), 0.0, np.float32)
    for c in range(k):
        masks[:, c][np.broadcast_to(sem == c, (b, h, w))] = 10.0
        logits[:, c, c] = 20.0
    logits[:, k:, k] = 20.0  # leftover queries predict no-object
    outputs = {
        "pred_logits": jnp.asarray(logits),
        "pred_masks": jnp.asarray(masks),
        "pred_logits_ood": jnp.asarray(logits),
        "pred_masks_ood": jnp.asarray(masks),
    }
    cfg = CriterionConfig(num_classes=k, num_points=256, ood_loss="margin")
    total, losses = set_criterion(outputs, jnp.asarray(sem), jax.random.PRNGKey(3), cfg)
    assert float(losses["loss_ce"]) < 0.01
    # Point-sampled binary masks are fractional at class boundaries (the torch
    # reference's point_sample has the same property), so BCE against a confident
    # prediction has an irreducible boundary term ~ boundary_fraction * |logit|.
    assert float(losses["loss_original_mask"]) < 0.8
    assert float(losses["loss_original_dice"]) < 0.5
    # The "clean"-point selection of the augmented half drops boundary points
    # (they have the highest BCE), so this one should be near zero.
    assert float(losses["loss_aug_mask"]) < 0.05


def test_deep_supervision_repeats_losses(rng):
    cfg = CriterionConfig(num_classes=5, num_points=64, ood_loss="RCL",
                          deep_supervision=True)
    outputs = _tiny_outputs(rng)
    outputs["aux_outputs"] = [_tiny_outputs(rng) for _ in range(2)]
    sem = _tiny_sem(rng)
    rcl = RCLParams(ce_weights=(0.0, 0.0), inoutaug_contras_margins_tri=(0.7, 0.5, 0.2))
    total, losses = set_criterion(outputs, sem, jax.random.PRNGKey(0), cfg, rcl)
    assert "loss_ce_0" in losses and "loss_ce_1" in losses
    assert "loss_ood_1" in losses
    assert np.isfinite(float(total))
