"""Batched per-epoch validation shared by both trainers.

The reference validates with whole-image batch-1 forwards (``train_deeplab.py:228-240``);
round 2 kept that shape but metered on device. This reuses the evaluator's
shape-bucket batching (``test_runner.bucket_shape``) so validation rides the same
batch-4 throughput win as the test runner (~1.6x for DeepLab, PERF.md) — at MUAD
scale (102+ images) that is the difference between a fast epoch tail and a stall.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..evals.ood_metrics import BinnedOODMeter
from .test_runner import bucket_shape

log = logging.getLogger(__name__)


def batched_valid(
    val_ds,
    score_fn: Callable[[jnp.ndarray], jnp.ndarray],
    batch_size: int = 4,
) -> Optional[Dict[str, float]]:
    """On-device binned OOD metrics over ``val_ds`` with shape-bucketed batching.

    ``score_fn(imgs [B, Hb, Wb, 3] float32) -> anomaly [B, Hb, Wb]`` (jitted by the
    caller). Images sharing a padded bucket run through one compiled program; only
    the 3 final metric scalars cross the host boundary.
    """
    n = len(val_ds)
    if n == 0:
        return None

    buckets: Dict[Tuple[int, int], List[int]] = {}
    if hasattr(val_ds, "images"):
        from PIL import Image

        for i in range(n):
            with Image.open(val_ds.images[i]) as im:
                w, h = im.size
            buckets.setdefault(bucket_shape(h, w), []).append(i)
    else:  # no path list: probe by decoding (synthetic/test datasets)
        for i in range(n):
            h, w = val_ds[i][0].shape[:2]
            buckets.setdefault(bucket_shape(h, w), []).append(i)

    meter = BinnedOODMeter()
    for (bh, bw), idxs in buckets.items():
        for s in range(0, len(idxs), batch_size):
            chunk = [val_ds[i] for i in idxs[s : s + batch_size]]
            imgs = np.zeros((len(chunk), bh, bw, 3), np.float32)
            for j, item in enumerate(chunk):
                img = item[0]
                # buckets were computed from the on-disk size; a transform that
                # rescales would silently break the bucketing contract
                assert img.shape[0] <= bh and img.shape[1] <= bw, (
                    f"transformed image {img.shape[:2]} exceeds its shape bucket "
                    f"({bh}, {bw}) — the val transform must not enlarge images"
                )
                imgs[j, : img.shape[0], : img.shape[1]] = img
            anomaly = score_fn(jnp.asarray(imgs))
            for j, item in enumerate(chunk):
                h, w = item[0].shape[:2]
                meter.update(anomaly[j, :h, :w], item[1])
    res = meter.compute()
    if res is None:
        return None
    auroc, auprc, fpr = res
    return {"AUROC": auroc, "AUPRC": auprc, "FPR_TPR95": fpr}
