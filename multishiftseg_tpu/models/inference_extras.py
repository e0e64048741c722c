"""Panoptic / instance inference and test-time augmentation.

Behavioural ports of the reference's auxiliary inference paths:
* ``panoptic_inference`` (``maskformer_model.py:356-412``) — argmax over
  score-weighted masks with overlap filtering and stuff-region merging;
* ``instance_inference`` (``maskformer_model.py:414-450``) — top-k query/class pairs
  with mask-probability-weighted scores;
* ``SemanticSegmentorWithTTA`` hflip averaging (``test_time_augmentation.py:21-103``).

The device computes query scores and upsampled mask probabilities; the segment
bookkeeping (dynamic per-image segment counts) runs host-side in numpy — the same
split the reference effectively has (python loops over queries).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# Cityscapes train-id things (instances exist): person..bicycle = 11..18.
CITYSCAPES_THING_IDS: Set[int] = {11, 12, 13, 14, 15, 16, 17, 18}


def panoptic_inference(
    mask_cls: np.ndarray,  # [Q, K+1] logits
    mask_pred: np.ndarray,  # [Q, H, W] logits (upsampled)
    thing_ids: Set[int] = CITYSCAPES_THING_IDS,
    object_mask_threshold: float = 0.8,
    overlap_threshold: float = 0.8,
) -> Tuple[np.ndarray, List[Dict]]:
    """Returns (panoptic_seg [H, W] int32 segment ids, segments_info)."""
    num_classes = mask_cls.shape[-1] - 1
    probs = _softmax(mask_cls)
    scores = probs.max(-1)
    labels = probs.argmax(-1)
    mask_prob = _sigmoid(mask_pred)

    keep = (labels != num_classes) & (scores > object_mask_threshold)
    cur_scores = scores[keep]
    cur_classes = labels[keep]
    cur_masks = mask_prob[keep]

    h, w = mask_pred.shape[-2:]
    panoptic_seg = np.zeros((h, w), np.int32)
    segments_info: List[Dict] = []
    if cur_masks.shape[0] == 0:
        return panoptic_seg, segments_info

    cur_prob_masks = cur_scores[:, None, None] * cur_masks
    cur_mask_ids = cur_prob_masks.argmax(0)
    stuff_memory: Dict[int, int] = {}
    segment_id = 0
    for k in range(cur_classes.shape[0]):
        pred_class = int(cur_classes[k])
        isthing = pred_class in thing_ids
        mask = (cur_mask_ids == k) & (cur_masks[k] >= 0.5)
        mask_area = int(mask.sum())
        original_area = int((cur_masks[k] >= 0.5).sum())
        if mask_area > 0 and original_area > 0:
            if mask_area / original_area < overlap_threshold:
                continue
            if not isthing:
                if pred_class in stuff_memory:
                    panoptic_seg[mask] = stuff_memory[pred_class]
                    continue
                stuff_memory[pred_class] = segment_id + 1
            segment_id += 1
            panoptic_seg[mask] = segment_id
            segments_info.append(
                {"id": segment_id, "isthing": isthing, "category_id": pred_class}
            )
    return panoptic_seg, segments_info


def instance_inference(
    mask_cls: np.ndarray,  # [Q, K+1]
    mask_pred: np.ndarray,  # [Q, H, W] logits
    test_topk_per_image: int = 100,
    thing_ids: Optional[Set[int]] = None,
) -> Dict[str, np.ndarray]:
    """Returns {'pred_masks' [T,H,W] binary, 'scores' [T], 'pred_classes' [T]}."""
    q, kk = mask_cls.shape
    num_classes = kk - 1
    scores = _softmax(mask_cls)[:, :-1]  # [Q, K]
    flat = scores.reshape(-1)
    topk = min(test_topk_per_image, flat.size)
    idx = np.argpartition(-flat, topk - 1)[:topk]
    scores_per_image = flat[idx]
    labels_per_image = idx % num_classes
    query_idx = idx // num_classes
    masks = mask_pred[query_idx]

    if thing_ids is not None:
        keep = np.isin(labels_per_image, list(thing_ids))
        scores_per_image = scores_per_image[keep]
        labels_per_image = labels_per_image[keep]
        masks = masks[keep]

    binary = (masks > 0).astype(np.float32)
    mask_probs = _sigmoid(masks)
    denom = binary.reshape(binary.shape[0], -1).sum(1) + 1e-6
    mask_scores = (mask_probs * binary).reshape(binary.shape[0], -1).sum(1) / denom
    return {
        "pred_masks": binary,
        "scores": scores_per_image * mask_scores,
        "pred_classes": labels_per_image,
    }


def hflip_tta(forward_fn: Callable, img: jax.Array):
    """Average semantic scores over {identity, horizontal flip}
    (``SemanticSegmentorWithTTA``). forward_fn(img) -> (sem [N, C, H, W], aux...)."""
    out = forward_fn(img)
    out_f = forward_fn(img[:, :, ::-1])
    sem = out[0] if isinstance(out, tuple) else out
    sem_f = out_f[0] if isinstance(out_f, tuple) else out_f
    avg = 0.5 * (sem + sem_f[:, :, :, ::-1])
    if isinstance(out, tuple):
        return (avg,) + tuple(out[1:])
    return avg


def _softmax(x: np.ndarray) -> np.ndarray:
    x = x - x.max(-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(-1, keepdims=True)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))
