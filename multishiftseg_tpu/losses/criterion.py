"""Set criterion for mask classification (Hungarian-matched losses) with the
Mask2Anomaly OOD extensions.

Behavioural port of the reference ``SetCriterion`` (``modeling/criterion.py:91-489``):
  * ``loss_labels`` — CE over query classifications with ``eos_coef`` no-object weight;
  * ``loss_masks_aug`` — point-sampled sigmoid-CE + dice over matched masks, with the
    batch split into [clean ‖ augmented] halves: the clean half samples points
    uniformly (weighted 2x), the augmented half samples "clean" points — the
    lowest-BCE 95% of points (``get_clean_point_coords_with_randomness``,
    criterion.py:371-407);
  * ``loss_ood`` — ``margin`` / ``bce`` / ``RCL`` modes over the rebuilt per-pixel
    score maps; RCL delegates to :mod:`multishiftseg_tpu.losses.rcl`.

TPU-native design: target masks are never materialized as [B, T, H, W] tensors — every
mask use is point-based, so targets are sampled directly from the label map by a
4-corner gather + per-class comparison (exactly bilinear interpolation of the one-hot
mask). Targets are the K train-id slots per image with a presence mask, keeping all
shapes static.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from ..ops.sampling import point_sample
from ..ops.scores import mask2former_semantic_logits
from .matcher import match
from .rcl import RCLParams, rel_contrastive_loss


@dataclass(frozen=True)
class CriterionConfig:
    num_classes: int = 19
    eos_coef: float = 0.1
    num_points: int = 12544
    importance_sample_ratio: float = 0.75
    oversample_ratio: float = 3.0
    class_weight: float = 2.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    ood_weight: float = 1.0
    ood_loss: str = "RCL"  # margin | bce | RCL | none
    margin: float = 1.0
    deep_supervision: bool = False
    # clean-point sampling constants (hard-coded in the reference, criterion.py:374-376)
    clean_importance_ratio: float = 0.95
    clean_oversample: float = 1.25
    # reference get_loss gate (criterion.py:420-425): pixel-selection ON selects
    # loss_masks_aug; OFF selects the plain uncertainty-sampled loss_masks.
    mask_loss_with_pixel_selection: bool = True
    # Accuracy-gated opt-in (MSS_APPROX_POINTS=1 in the trainers): replace the
    # exact top-k point selections (clean-BCE and uncertainty) with the TPU
    # bucketed approx_min_k reduction (recall_target 0.95) — the approximate
    # histogram-quantile-style selection lever for the stage-2 step (PERF.md
    # round-4 A/B; exact remains the default). On CPU approx_min_k falls back
    # to the exact reduction, so CPU tests exercise only the wiring.
    approx_point_topk: bool = False


def _corner_gather_labels(labels: jax.Array, coords: jax.Array):
    """4-corner bilinear data for a label map.

    Args:
      labels: [B, H, W] int label map.
      coords: [B, P, 2] in [0, 1] (x, y), grid_sample align_corners=False convention.
    Returns:
      corner_labels [B, P, 4] int, corner_weights [B, P, 4] (OOB corners weight 0).
    """
    b, h, w = labels.shape
    x = coords[..., 0] * w - 0.5
    y = coords[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = labels.reshape(b, h * w)

    def corner(ix, iy, wgt):
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
        lab = jax.vmap(lambda vb, ib: vb[ib])(flat, idx)
        return lab, wgt * valid.astype(jnp.float32)

    l00, w00 = corner(x0i, y0i, (1 - wx) * (1 - wy))
    l01, w01 = corner(x0i + 1, y0i, wx * (1 - wy))
    l10, w10 = corner(x0i, y0i + 1, (1 - wx) * wy)
    l11, w11 = corner(x0i + 1, y0i + 1, wx * wy)
    corner_labels = jnp.stack([l00, l01, l10, l11], axis=-1)
    corner_weights = jnp.stack([w00, w01, w10, w11], axis=-1)
    return corner_labels, corner_weights


def sample_target_points(
    labels: jax.Array, coords: jax.Array, num_classes: int
) -> jax.Array:
    """Bilinear samples of the per-class one-hot masks: [B, K, P]."""
    cl, cw = _corner_gather_labels(labels, coords)
    onehot = (cl[..., None] == jnp.arange(num_classes)).astype(jnp.float32)
    return jnp.einsum("bpc,bpck->bkp", cw, onehot)


def sample_class_points(
    labels: jax.Array, coords: jax.Array, class_id: jax.Array
) -> jax.Array:
    """Bilinear samples of the one-hot mask of a single class: [B, P].

    labels [B, H, W]; coords [B, P, 2]; class_id scalar or [B]."""
    cl, cw = _corner_gather_labels(labels, coords)
    cid = jnp.broadcast_to(jnp.asarray(class_id), (labels.shape[0],))
    hit = (cl == cid[:, None, None]).astype(jnp.float32)
    return jnp.sum(cw * hit, axis=-1)


def _sample_pred_points(pred_masks: jax.Array, coords: jax.Array) -> jax.Array:
    """pred_masks [B, Q, Hs, Ws], coords [B, P, 2] -> [B, Q, P]."""
    nhwc = pred_masks.transpose(0, 2, 3, 1)
    return point_sample(nhwc, coords).transpose(0, 2, 1)


def _dice(point_logits, point_labels, w):
    """Per-mask dice, weighted sum. point_*: [M, P]; w: [M]."""
    probs = jax.nn.sigmoid(point_logits)
    num = 2.0 * jnp.sum(probs * point_labels, -1)
    den = jnp.sum(probs, -1) + jnp.sum(point_labels, -1)
    return jnp.sum((1.0 - (num + 1.0) / (den + 1.0)) * w)


def _sigmoid_ce(point_logits, point_labels, w):
    """Per-mask mean BCE, weighted sum."""
    ce = jnp.maximum(point_logits, 0) - point_logits * point_labels + jax.nn.softplus(
        -jnp.abs(point_logits)
    )
    return jnp.sum(jnp.mean(ce, -1) * w)


def _clean_point_coords(
    rng, pred_mask: jax.Array, labels: jax.Array, class_id: jax.Array,
    cfg: CriterionConfig,
) -> jax.Array:
    """Lowest-BCE ("clean") point selection for one matched mask of the augmented half.

    pred_mask: [Hs, Ws] logits; labels: [H, W] label map; class_id: scalar.
    Returns [num_points, 2] coords.
    """
    num_sampled = int(cfg.num_points * cfg.clean_oversample)
    num_clean = int(cfg.clean_importance_ratio * cfg.num_points)
    num_rand = cfg.num_points - num_clean
    k1, k2 = jax.random.split(rng)
    coords = jax.random.uniform(k1, (num_sampled, 2))
    logits = point_sample(pred_mask[None, :, :, None], coords[None])[0, :, 0]
    tgt = sample_class_points(labels[None], coords[None], class_id)[0]
    bce = jnp.maximum(logits, 0) - logits * tgt + jax.nn.softplus(-jnp.abs(logits))
    if cfg.approx_point_topk:
        _, idx = jax.lax.approx_min_k(bce, num_clean)
    else:
        _, idx = jax.lax.top_k(-bce, num_clean)
    clean = coords[idx]
    rand = jax.random.uniform(k2, (num_rand, 2))
    return jnp.concatenate([clean, rand], axis=0)


def uncertain_point_coords(
    rng, pred_mask: jax.Array, cfg: CriterionConfig
) -> jax.Array:
    """PointRend importance sampling for one mask: ``num_points * oversample_ratio``
    uniform candidates, keep the ``importance_sample_ratio`` fraction with the
    highest uncertainty ``-|logit|`` (``calculate_uncertainty``), fill the rest with
    fresh uniform points (detectron2 ``get_uncertain_point_coords_with_randomness``,
    selected by reference ``criterion.py:333-340``).

    pred_mask: [Hs, Ws] logits. Returns [num_points, 2] (x, y) coords in [0, 1].
    """
    num_sampled = int(cfg.num_points * cfg.oversample_ratio)
    num_uncertain = int(cfg.importance_sample_ratio * cfg.num_points)
    num_rand = cfg.num_points - num_uncertain
    k1, k2 = jax.random.split(rng)
    coords = jax.random.uniform(k1, (num_sampled, 2))
    logits = point_sample(pred_mask[None, :, :, None], coords[None])[0, :, 0]
    if cfg.approx_point_topk:
        _, idx = jax.lax.approx_min_k(jnp.abs(logits), num_uncertain)
    else:
        _, idx = jax.lax.top_k(-jnp.abs(logits), num_uncertain)
    out = coords[idx]
    if num_rand > 0:
        out = jnp.concatenate([out, jax.random.uniform(k2, (num_rand, 2))], axis=0)
    return out


def _plain_mask_losses(
    rng, matched_masks: jax.Array, sem_seg: jax.Array, class_ids: jax.Array,
    w_valid: jax.Array, num_masks: jax.Array, cfg: CriterionConfig,
) -> Dict[str, jax.Array]:
    """The plain uncertainty-sampled ``loss_masks`` (reference criterion.py:312-363)
    over all matched masks — no clean/aug split, no 2x weighting.

    matched_masks: [B, T, Hs, Ws]; sem_seg: [B, H, W] (values compared to class_ids);
    class_ids: [B*T]; w_valid: [B, T].
    """
    b, t = matched_masks.shape[:2]
    keys = jax.random.split(rng, b * t)
    mm = matched_masks.reshape(b * t, *matched_masks.shape[2:])
    lm_rep = jnp.repeat(sem_seg, t, axis=0)  # [B*T, H, W]

    def one(key, pm, lm, cid):
        coords = uncertain_point_coords(key, pm, cfg)
        lg = point_sample(pm[None, :, :, None], coords[None])[0, :, 0]
        tg = sample_class_points(lm[None], coords[None], cid)[0]
        return lg, tg

    logits, tgts = jax.vmap(one)(keys, mm, lm_rep, class_ids)
    w = w_valid.reshape(-1)
    return {
        "loss_mask": _sigmoid_ce(logits, tgts, w) / num_masks * cfg.mask_weight,
        "loss_dice": _dice(logits, tgts, w) / num_masks * cfg.dice_weight,
    }


def set_criterion(
    outputs: Dict[str, jax.Array],
    sem_seg: jax.Array,  # [B, Hp, Wp] padded label map (255 in padding)
    rng: jax.Array,
    cfg: CriterionConfig,
    rcl_params: Optional[RCLParams] = None,
    crop_hw: Optional[Tuple[int, int]] = None,  # un-padded label extent for RCL
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Compute the weighted total loss + component dict.

    The leading batch axis is [clean ‖ augmented]; target slots are train ids 0..K-1
    with presence masks. ``rng`` drives all point sampling. With
    ``cfg.deep_supervision`` the full match + losses repeat per aux output with
    ``_{i}``-suffixed keys (reference criterion.py:461-467).
    """
    total, losses = _single_output_losses(
        outputs, sem_seg, rng, cfg, rcl_params, crop_hw
    )
    if cfg.deep_supervision:
        for i, aux in enumerate(outputs.get("aux_outputs", [])):
            aux_rng = jax.random.fold_in(rng, 100 + i)
            has_ood = "pred_logits_ood" in aux
            # aux outputs without OOD heads fall back to the margin OOD loss on
            # the main heads — but NEVER resurrect an OOD loss the caller
            # disabled (ood_loss='none' = vanilla non-anomaly training)
            aux_cfg = cfg if has_ood or cfg.ood_loss == "none" else (
                dataclasses.replace(cfg, ood_loss="margin"))
            t_i, l_i = _single_output_losses(
                aux, sem_seg, aux_rng, aux_cfg,
                rcl_params if has_ood or aux_cfg.ood_loss != "RCL" else None,
                crop_hw,
            )
            total = total + t_i
            losses.update({f"{k}_{i}": v for k, v in l_i.items()})
    return total, losses


def set_criterion_instance(
    outputs: Dict[str, jax.Array],
    id_map: jax.Array,  # [B, H, W] segment index per pixel (ignore = any value >= T)
    tgt_classes: jax.Array,  # [B, T] int class per segment slot, -1 = padding
    rng: jax.Array,
    cfg: CriterionConfig,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Instance-style criterion: per-instance ``(gt_classes, gt_masks)`` targets with
    duplicate classes allowed (reference ``prepare_targets``,
    ``maskformer_model.py:316-339``) in padded-T form, consuming
    :mod:`multishiftseg_tpu.data.mappers` ``SegmentTargets`` (``id_map`` +
    ``classes``). Losses = labels + plain uncertainty-sampled masks
    (criterion.py:179-205, 312-363); panoptic/instance training uses no OOD loss.

    With ``cfg.deep_supervision`` the match + losses repeat per aux output.
    """
    total, losses = _instance_output_losses(outputs, id_map, tgt_classes, rng, cfg)
    if cfg.deep_supervision:
        for i, aux in enumerate(outputs.get("aux_outputs", [])):
            t_i, l_i = _instance_output_losses(
                aux, id_map, tgt_classes, jax.random.fold_in(rng, 100 + i), cfg
            )
            total = total + t_i
            losses.update({f"{k}_{i}": v for k, v in l_i.items()})
    return total, losses


def _instance_output_losses(
    outputs, id_map, tgt_classes, rng, cfg
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    b, t = tgt_classes.shape
    K = cfg.num_classes
    pred_logits = outputs["pred_logits"].astype(jnp.float32)  # [B, Q, K+1]
    pred_masks = outputs["pred_masks"].astype(jnp.float32)  # [B, Q, Hs, Ws]
    valid = tgt_classes >= 0
    # reference: num_masks = total instances across the batch (criterion.py:442-458,
    # dist all-reduce folded in because the step jits over the global batch)
    num_masks = jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)

    k_match, k_pts = jax.random.split(rng)
    match_coords = jax.random.uniform(k_match, (b, cfg.num_points, 2))
    out_pts = _sample_pred_points(pred_masks, match_coords)
    # slot masks are (id_map == t): identical bilinear sampling to the semantic path
    # with "classes" = slot indices
    tgt_pts = sample_target_points(id_map, match_coords, t)
    assignment = jax.lax.stop_gradient(
        match(
            pred_logits, out_pts, tgt_pts, valid,
            cost_class_w=cfg.class_weight, cost_mask_w=cfg.mask_weight,
            cost_dice_w=cfg.dice_weight, tgt_classes=tgt_classes,
        )
    )  # [B, T] query per target slot

    # loss_labels with duplicate classes: scatter each slot's class at its matched
    # query (assignment is injective over slots, so collision-free)
    batch_idx = jnp.arange(b)[:, None]
    target_classes = jnp.full((b, pred_logits.shape[1]), K, jnp.int32)
    target_classes = target_classes.at[batch_idx, assignment].set(
        jnp.where(valid, tgt_classes, K).astype(jnp.int32)
    )
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target_classes[..., None], axis=-1)[..., 0]
    class_w = jnp.where(target_classes == K, cfg.eos_coef, 1.0)
    loss_ce = jnp.sum(nll * class_w) / jnp.sum(class_w)

    matched_masks = pred_masks[batch_idx, assignment]  # [B, T, Hs, Ws]
    losses = {
        "loss_ce": loss_ce * cfg.class_weight,
        **_plain_mask_losses(
            k_pts, matched_masks, id_map,
            jnp.tile(jnp.arange(t), b), valid.astype(jnp.float32), num_masks, cfg,
        ),
    }
    return sum(losses.values()), losses


def _single_output_losses(
    outputs: Dict[str, jax.Array],
    sem_seg: jax.Array,
    rng: jax.Array,
    cfg: CriterionConfig,
    rcl_params: Optional[RCLParams] = None,
    crop_hw: Optional[Tuple[int, int]] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    b = sem_seg.shape[0]
    half = b // 2
    K = cfg.num_classes
    pred_logits = outputs["pred_logits"].astype(jnp.float32)  # [B, Q, K+1]
    pred_masks = outputs["pred_masks"].astype(jnp.float32)  # [B, Q, Hs, Ws]

    valid = jax.vmap(
        lambda lm: jnp.bincount(jnp.where(lm < K, lm, K), length=K + 1)[:K] > 0
    )(sem_seg.reshape(b, -1))

    num_masks = jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)

    # ---------------- matching (shared random points per image) -------------------
    k_match, k_orig, k_clean = jax.random.split(rng, 3)
    match_coords = jax.random.uniform(k_match, (b, cfg.num_points, 2))
    out_pts = _sample_pred_points(pred_masks, match_coords)
    tgt_pts = sample_target_points(sem_seg, match_coords, K)
    assignment = jax.lax.stop_gradient(
        match(
            pred_logits, out_pts, tgt_pts, valid,
            cost_class_w=cfg.class_weight, cost_mask_w=cfg.mask_weight,
            cost_dice_w=cfg.dice_weight,
        )
    )  # [B, K] query per class-slot

    # ---------------- loss_labels (criterion.py:189-205) --------------------------
    target_classes = jnp.full((b, pred_logits.shape[1]), K, jnp.int32)
    batch_idx = jnp.arange(b)[:, None]
    slot_classes = jnp.broadcast_to(jnp.arange(K)[None], (b, K))
    # queries are matched 1:1 with slots; invalid slots scatter K (no-object), which
    # equals the default, so the scatter is collision-free and exact.
    target_classes = target_classes.at[batch_idx, assignment].set(
        jnp.where(valid, slot_classes, K)
    )
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target_classes[..., None], axis=-1)[..., 0]
    class_w = jnp.where(target_classes == K, cfg.eos_coef, 1.0)
    loss_ce = jnp.sum(nll * class_w) / jnp.sum(class_w)

    matched_masks = pred_masks[batch_idx, assignment]  # [B, K, Hs, Ws]
    w_valid = valid.astype(jnp.float32)

    if not cfg.mask_loss_with_pixel_selection:
        # ------------ plain loss_masks (criterion.py:312-363, get_loss :420-425) --
        losses = {
            "loss_ce": loss_ce * cfg.class_weight,
            **_plain_mask_losses(
                k_orig, matched_masks, sem_seg,
                jnp.tile(jnp.arange(K), b), w_valid, num_masks, cfg,
            ),
        }
        return _finish_ood_loss(
            outputs, sem_seg, rng, cfg, rcl_params, crop_hw, pred_logits,
            pred_masks, losses,
        )

    # ---------------- loss_masks_aug (criterion.py:244-310) -----------------------
    # clean half: fresh uniform random points per mask
    orig_coords = jax.random.uniform(k_orig, (half, K, cfg.num_points, 2))
    om = matched_masks[:half].reshape(half * K, *matched_masks.shape[2:])
    oc = orig_coords.reshape(half * K, cfg.num_points, 2)
    orig_logits = point_sample(om[..., None], oc)[..., 0]
    lm_rep = jnp.repeat(sem_seg[:half], K, axis=0)  # [half*K, H, W]
    class_ids = jnp.tile(jnp.arange(K), half)
    orig_tgts = sample_class_points(lm_rep, oc, class_ids)
    w_orig = w_valid[:half].reshape(-1)
    loss_orig_mask = 2.0 * _sigmoid_ce(orig_logits, orig_tgts, w_orig) / num_masks
    loss_orig_dice = 2.0 * _dice(orig_logits, orig_tgts, w_orig) / num_masks

    # augmented half: lowest-BCE "clean" points per mask
    clean_keys = jax.random.split(k_clean, half * K)
    am = matched_masks[half:].reshape(half * K, *matched_masks.shape[2:])
    lm_aug = jnp.repeat(sem_seg[half:], K, axis=0)

    def clean_one(key, pm, lm, cid):
        coords = _clean_point_coords(key, pm, lm, cid, cfg)
        lg = point_sample(pm[None, :, :, None], coords[None])[0, :, 0]
        tg = sample_class_points(lm[None], coords[None], cid)[0]
        return lg, tg

    aug_logits, aug_tgts = jax.vmap(clean_one)(clean_keys, am, lm_aug, class_ids)
    w_aug = w_valid[half:].reshape(-1)
    loss_aug_mask = _sigmoid_ce(aug_logits, aug_tgts, w_aug) / num_masks
    loss_aug_dice = _dice(aug_logits, aug_tgts, w_aug) / num_masks

    losses = {
        "loss_ce": loss_ce * cfg.class_weight,
        "loss_original_mask": loss_orig_mask * cfg.mask_weight,
        "loss_original_dice": loss_orig_dice * cfg.dice_weight,
        "loss_aug_mask": loss_aug_mask * cfg.mask_weight,
        "loss_aug_dice": loss_aug_dice * cfg.dice_weight,
    }
    return _finish_ood_loss(
        outputs, sem_seg, rng, cfg, rcl_params, crop_hw, pred_logits, pred_masks,
        losses,
    )


def _finish_ood_loss(
    outputs, sem_seg, rng, cfg, rcl_params, crop_hw, pred_logits, pred_masks, losses
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    # ---------------- loss_ood (criterion.py:128-187) -----------------------------
    if cfg.ood_loss == "none":
        # vanilla (non-anomaly) training: losses = [labels, masks] only
        # (reference from_config adds "ood" only under OOD_FINETUNE).
        return sum(losses.values()), losses
    ood_masks_ = (sem_seg > 100) & (sem_seg != 255)
    hw = sem_seg.shape[-2:]
    logits_px = mask2former_semantic_logits(pred_logits, pred_masks)
    logits_px = resize_bilinear(logits_px, hw, align_corners=False)

    if cfg.ood_loss == "RCL":
        assert rcl_params is not None
        ch, cw_ = crop_hw or hw
        bal = mask2former_semantic_logits(
            outputs["pred_logits_ood"], outputs["pred_masks_ood"])
        bal = resize_bilinear(bal, hw, align_corners=False)[:, :ch, :cw_]
        score = -jnp.max(bal, axis=-1)
        rcl_rng = jax.random.fold_in(rng, 7)
        loss_ood, _ = rel_contrastive_loss(
            logits_px[:, :ch, :cw_], score, sem_seg[:, :ch, :cw_], rcl_rng, rcl_params
        )
    elif cfg.ood_loss in ("margin", "bce"):
        score = -jnp.max(logits_px, axis=-1)
        ood_f = ood_masks_.astype(jnp.float32)
        id_f = (sem_seg < 100).astype(jnp.float32)
        if cfg.ood_loss == "margin":
            id_term = jnp.sum(score**2 * id_f) / jnp.maximum(jnp.sum(id_f), 1)
            ood_term = jnp.sum(
                jnp.clip(cfg.margin - score, 0) ** 2 * ood_f
            ) / jnp.maximum(jnp.sum(ood_f), 1)
            loss_ood = 0.5 * (id_term + jnp.where(jnp.sum(ood_f) > 0, ood_term, 0.0))
        else:
            bce_id = jax.nn.softplus(score) * id_f
            bce_ood = jax.nn.softplus(-score) * ood_f
            loss_ood = 0.5 * (
                jnp.sum(bce_id) / jnp.maximum(jnp.sum(id_f), 1)
                + jnp.where(
                    jnp.sum(ood_f) > 0,
                    jnp.sum(bce_ood) / jnp.maximum(jnp.sum(ood_f), 1),
                    0.0,
                )
            )
    else:
        raise ValueError(f"unknown ood_loss {cfg.ood_loss}")

    losses["loss_ood"] = loss_ood * cfg.ood_weight
    total = sum(losses.values())
    return total, losses
