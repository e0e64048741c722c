"""Fused per-pixel anomaly-score ops.

These are the score heads of both model families, written as single fusable XLA
expressions:

* ``energy_score`` — DeepLab's negative-energy anomaly score
  (reference ``lib/network/deepv3/deepv3.py:251-253``: ``-logsumexp(ood_logits, C)``).
* ``mask2former_semantic_logits`` — the softmax x sigmoid einsum of MaskFormer semantic
  inference (reference ``maskformer_model.py:341-354``).
* ``mask2former_anomaly_score`` — Mask2Anomaly's ``1 - max_c`` uncertainty over the OOD
  head pair (reference ``train_m2f.py:387-407``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def energy_score(ood_logits: jax.Array) -> jax.Array:
    """Negative free energy over the channel (last) axis. [..., C] -> [...]."""
    return -jax.nn.logsumexp(ood_logits.astype(jnp.float32), axis=-1)


def mask2former_semantic_logits(class_logits: jax.Array, mask_logits: jax.Array) -> jax.Array:
    """Per-pixel class scores from query-level predictions.

    Args:
      class_logits: [B, Q, K+1] classification logits.
      mask_logits: [B, Q, H, W] mask logits.
    Returns:
      [B, H, W, K] semantic scores (softmax over classes x sigmoid over masks).
    """
    probs = jax.nn.softmax(class_logits.astype(jnp.float32), axis=-1)[..., :-1]
    masks = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
    return jnp.einsum("bqk,bqhw->bhwk", probs, masks)


def mask2former_anomaly_score(
    class_logits_ood: jax.Array, mask_logits_ood: jax.Array
) -> jax.Array:
    """Mask2Anomaly per-pixel anomaly score: ``1 - max_k (softmax x sigmoid)``.

    Args:
      class_logits_ood: [B, Q, K+1] from the duplicate ``class_embed2`` head.
      mask_logits_ood: [B, Q, H, W] from the shared mask head.
    Returns:
      [B, H, W] anomaly scores.
    """
    sem = mask2former_semantic_logits(class_logits_ood, mask_logits_ood)
    return 1.0 - jnp.max(sem, axis=-1)
