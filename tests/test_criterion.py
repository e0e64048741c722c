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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_uncertain_point_coords_semantics():
    """PointRend importance sampling (reference criterion.py:333-340 via detectron2
    get_uncertain_point_coords_with_randomness): with |logits| huge everywhere except
    a stripe where logits ~ 0, every importance-sampled point must land in the
    stripe; the random tail is uniform in [0, 1]^2."""
    from multishiftseg_tpu.losses.criterion import uncertain_point_coords

    h, w = 64, 64
    mask = np.full((h, w), 30.0, np.float32)
    mask[:, 24:40] = 0.0  # most-uncertain stripe: x in [0.375, 0.625]
    cfg = CriterionConfig(num_points=128, oversample_ratio=3.0,
                          importance_sample_ratio=0.75)
    coords = np.asarray(
        uncertain_point_coords(jax.random.PRNGKey(0), jnp.asarray(mask), cfg)
    )
    assert coords.shape == (128, 2)
    n_unc = int(0.75 * 128)
    xs = coords[:n_unc, 0]
    # bilinear sampling of the stripe: points strictly inside have |logit| < points
    # outside, and 3x oversampling of 128 points puts ~96 candidates in the stripe
    # (width 0.25 -> ~96 expected) — allow boundary-interpolation slack.
    inside = (xs > 24 / w - 1.5 / w) & (xs < 40 / w + 0.5 / w)
    assert inside.mean() > 0.95, inside.mean()
    assert (coords >= 0).all() and (coords <= 1).all()


@pytest.mark.slow
def test_plain_loss_masks_path(rng):
    """mask_loss_with_pixel_selection=False selects the plain uncertainty-sampled
    loss_masks (reference get_loss, criterion.py:420-425)."""
    cfg = CriterionConfig(num_classes=5, num_points=64, ood_loss="margin",
                          mask_loss_with_pixel_selection=False)
    outputs = _tiny_outputs(rng)
    sem = _tiny_sem(rng)
    total, losses = jax.jit(
        lambda o, s: set_criterion(o, s, jax.random.PRNGKey(0), cfg)
    )(outputs, sem)
    assert {"loss_ce", "loss_mask", "loss_dice", "loss_ood"} == set(losses.keys())
    assert np.isfinite(float(total))

    def f(o):
        t, _ = set_criterion(o, sem, jax.random.PRNGKey(0), cfg)
        return t

    g = jax.grad(f)(outputs)
    assert np.abs(np.asarray(g["pred_masks"])).sum() > 0


def test_plain_loss_masks_no_ood(rng):
    """ood_loss='none' drops the OOD loss entirely (vanilla Mask2Former training)."""
    cfg = CriterionConfig(num_classes=5, num_points=64, ood_loss="none",
                          mask_loss_with_pixel_selection=False)
    outputs = _tiny_outputs(rng)
    sem = _tiny_sem(rng)
    total, losses = set_criterion(outputs, sem, jax.random.PRNGKey(0), cfg)
    assert {"loss_ce", "loss_mask", "loss_dice"} == set(losses.keys())
    assert np.isfinite(float(total))


def test_instance_criterion_duplicate_classes(rng):
    """Instance-target mode: two instances of the SAME class get matched to two
    DIFFERENT queries via the mask costs (reference prepare_targets semantics,
    maskformer_model.py:316-339 + matcher.py:118 -out_prob[:, tgt_ids])."""
    from multishiftseg_tpu.losses.criterion import set_criterion_instance

    b, h, w, q, k = 2, 32, 32, 8, 5
    id_map = np.full((b, h, w), 255, np.int32)
    id_map[:, :, :10] = 0     # instance 0: class 2, left
    id_map[:, :, 22:] = 1     # instance 1: class 2, right (duplicate class)
    id_map[0, :10, 12:20] = 2 # instance 2 (image 0 only): class 4
    tgt_classes = np.asarray([[2, 2, 4], [2, 2, -1]], np.int32)  # image 1: 1 pad

    # queries 0/1 predict the two class-2 instances, query 3 (image 0) the class-4 one
    masks = np.full((b, q, h, w), -10.0, np.float32)
    masks[:, 0, :, :10] = 10.0
    masks[:, 1, :, 22:] = 10.0
    masks[0, 3, :10, 12:20] = 10.0
    logits = np.zeros((b, q, k + 1), np.float32)
    logits[:, 0, 2] = 20.0
    logits[:, 1, 2] = 20.0
    logits[0, 3, 4] = 20.0
    logits[1, 3, k] = 20.0
    logits[:, [2, 4, 5, 6, 7], k] = 20.0
    outputs = {"pred_logits": jnp.asarray(logits), "pred_masks": jnp.asarray(masks)}
    cfg = CriterionConfig(num_classes=k, num_points=256, ood_loss="none",
                          mask_loss_with_pixel_selection=False)
    total, losses = jax.jit(
        lambda o, i, t: set_criterion_instance(o, i, t, jax.random.PRNGKey(0), cfg)
    )(outputs, jnp.asarray(id_map), jnp.asarray(tgt_classes))
    assert np.isfinite(float(total))
    # a perfect duplicate-class prediction must produce near-zero ce + tiny mask loss
    assert float(losses["loss_ce"]) < 0.01
    assert float(losses["loss_dice"]) < 0.5

    # assignment parity vs scipy on the same cost (reference matcher semantics)
    from scipy.optimize import linear_sum_assignment as scipy_lsa

    from multishiftseg_tpu.losses.criterion import (
        _sample_pred_points, sample_target_points)
    from multishiftseg_tpu.losses.matcher import compute_match_cost, match

    coords = jax.random.uniform(jax.random.split(jax.random.PRNGKey(5))[0],
                                (b, 256, 2))
    out_pts = _sample_pred_points(jnp.asarray(masks), coords)
    tgt_pts = sample_target_points(jnp.asarray(id_map), coords, 3)
    valid = jnp.asarray(tgt_classes) >= 0
    got = np.asarray(match(jnp.asarray(logits), out_pts, tgt_pts, valid,
                           tgt_classes=jnp.asarray(tgt_classes)))
    for bi in range(b):
        cost = np.asarray(compute_match_cost(
            jnp.asarray(logits[bi]), out_pts[bi], tgt_pts[bi], valid[bi],
            2.0, 5.0, 5.0, tgt_classes=jnp.asarray(tgt_classes[bi])))
        rows, cols = scipy_lsa(cost.T)  # rows = targets
        np.testing.assert_array_equal(got[bi], cols)
    # the two duplicate-class instances matched to the two distinct mask queries
    assert set(got[0][:2]) == {0, 1}


def test_approx_point_topk_grad_agreement(rng):
    """MSS_APPROX_POINTS gate: the approximate point-selection top-k
    (jax.lax.approx_min_k, recall 0.95 on TPU) must keep loss AND gradients in
    close agreement with the exact selection — the same style of gate as
    MSS_BF16_SCATTER. On CPU approx_min_k is exact, so this checks wiring +
    establishes the agreement harness the TPU A/B (PERF.md round 4) reuses."""
    outputs = _tiny_outputs(rng)
    sem = _tiny_sem(rng)
    rcl = RCLParams(ce_weights=(1.0, 1.0),
                    inoutaug_contras_margins_tri=(0.7, 0.5, 0.2))

    def total_fn(o, approx):
        cfg = CriterionConfig(num_classes=5, num_points=64, ood_loss="RCL",
                              approx_point_topk=approx)
        t, _ = set_criterion(o, sem, jax.random.PRNGKey(0), cfg, rcl)
        return t

    t_exact, g_exact = jax.value_and_grad(lambda o: total_fn(o, False))(outputs)
    t_appr, g_appr = jax.value_and_grad(lambda o: total_fn(o, True))(outputs)
    assert np.isfinite(float(t_appr))
    np.testing.assert_allclose(float(t_appr), float(t_exact), rtol=0.05)
    for name in g_exact:
        a = np.asarray(g_exact[name]).reshape(-1)
        b = np.asarray(g_appr[name]).reshape(-1)
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        cos = float(a @ b) / max(denom, 1e-12)
        assert cos > 0.99, (name, cos)
