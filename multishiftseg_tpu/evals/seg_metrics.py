"""Closed-set semantic-segmentation metrics (confusion matrix, mIoU, pixel acc).

Numpy API mirrors the reference ``lib/utils/metric.py:10-64`` (``hist_info`` /
``compute_score``); a JAX ``confusion_matrix`` is provided so the histogram can be
accumulated on device during eval.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hist_info(n_cl: int, pred: np.ndarray, gt: np.ndarray) -> Tuple[np.ndarray, int, int]:
    """Confusion matrix + (labeled, correct) pixel counts. Ignores gt outside [0, n_cl)."""
    assert pred.shape == gt.shape
    k = (gt >= 0) & (gt < n_cl)
    labeled = int(np.sum(k))
    correct = int(np.sum(pred[k] == gt[k]))
    hist = np.bincount(
        n_cl * gt[k].astype(int) + pred[k].astype(int), minlength=n_cl**2
    ).reshape(n_cl, n_cl)
    return hist, labeled, correct


def compute_score(hist: np.ndarray, correct: int, labeled: int):
    iu = np.diag(hist) / (hist.sum(1) + hist.sum(0) - np.diag(hist))
    mean_iu = np.nanmean(iu)
    mean_pixel_acc = correct / max(labeled, 1)
    return iu, mean_iu, mean_pixel_acc


def compute_metric(results: List[Dict], n_cl: int = 19, per_class: bool = False):
    """Aggregate a list of {'hist','labeled','correct'} dicts into (mIoU, pixel acc)."""
    hist = np.zeros((n_cl, n_cl))
    correct = 0
    labeled = 0
    for d in results:
        hist += d["hist"]
        correct += d["correct"]
        labeled += d["labeled"]
    iu, mean_iu, mean_pixel_acc = compute_score(hist, correct, labeled)
    if per_class:
        class_acc = np.diag(hist) / np.maximum(hist.sum(axis=1), 1)
        return mean_iu, mean_pixel_acc, iu, class_acc
    return mean_iu, mean_pixel_acc


def confusion_matrix(pred: jax.Array, gt: jax.Array, n_cl: int = 19) -> jax.Array:
    """On-device confusion matrix. pred/gt: int arrays of any (equal) shape."""
    pred = pred.reshape(-1)
    gt = gt.reshape(-1)
    valid = (gt >= 0) & (gt < n_cl)
    idx = jnp.where(valid, gt * n_cl + jnp.clip(pred, 0, n_cl - 1), n_cl * n_cl)
    hist = jnp.zeros(n_cl * n_cl + 1, jnp.int32).at[idx].add(1)
    return hist[:-1].reshape(n_cl, n_cl)
