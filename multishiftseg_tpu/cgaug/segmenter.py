"""Promptable box-to-mask segmenter for CG-Aug quality filtering — fills the
``PromptableSegmenter`` protocol slot with a real, trainable JAX model.

The reference filters generated images with SAM ViT-H box prompting
(``CGAug/generate_multishift_image.py:145-184``, ``check_anomaly_by_SAM``): the pasted
anomaly's bbox prompts SAM, and the predicted mask must overlap the pasted label mask
with IoU > 0.7. The role is "image + box -> object mask". This module implements that
role with a compact encoder-decoder over [image ‖ box-prompt channel] — trainable on
any dataset with instance masks (e.g. the COCO OOD cut-out bank already indexed by
``DiverseCityscapes``) — rather than porting the 632M-parameter ViT-H.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class PromptUNet(nn.Module):
    """Binary-mask logits from [image(3) ‖ box channel(1)], stride-8 bottleneck."""

    base: int = 32
    mults: Sequence[int] = (1, 2, 4)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):  # [B, H, W, 4] -> [B, H, W] logits
        skips = []
        h = nn.Conv(self.base, (3, 3), dtype=self.dtype)(x)
        for li, m in enumerate(self.mults):
            h = nn.Conv(self.base * m, (3, 3), dtype=self.dtype)(h)
            h = nn.gelu(nn.GroupNorm(num_groups=8, dtype=self.dtype)(h))
            if li < len(self.mults) - 1:
                skips.append(h)
                h = nn.Conv(self.base * m, (3, 3), strides=(2, 2), dtype=self.dtype)(h)
        for li in range(len(self.mults) - 2, -1, -1):
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
            h = jnp.concatenate([h, skips.pop()], -1)
            h = nn.Conv(self.base * self.mults[li], (3, 3), dtype=self.dtype)(h)
            h = nn.gelu(nn.GroupNorm(num_groups=8, dtype=self.dtype)(h))
        return nn.Conv(1, (3, 3), dtype=self.dtype)(h)[..., 0]


def _box_channel(h: int, w: int, box_xyxy: np.ndarray) -> np.ndarray:
    ch = np.zeros((h, w), np.float32)
    x0, y0, x1, y1 = [int(v) for v in box_xyxy]
    ch[max(y0, 0) : y1 + 1, max(x0, 0) : x1 + 1] = 1.0
    return ch


class JaxPromptableSegmenter:
    """``PromptableSegmenter`` implementation around :class:`PromptUNet`."""

    def __init__(self, params=None, base: int = 32, seed: int = 0):
        self.model = PromptUNet(base=base)
        if params is None:
            params = jax.jit(self.model.init)(
                {"params": jax.random.PRNGKey(seed)}, jnp.zeros((1, 32, 32, 4))
            )["params"]
        self.params = params
        self._fwd = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x)
        )

    def segment_box(self, image: np.ndarray, box_xyxy: np.ndarray) -> np.ndarray:
        """[H, W, 3] uint8 image + [4] xyxy box -> binary mask [H, W]."""
        h, w = image.shape[:2]
        ph, pw = (-h) % 8, (-w) % 8
        x = np.concatenate(
            [image.astype(np.float32) / 127.5 - 1.0,
             _box_channel(h, w, box_xyxy)[..., None]], axis=-1,
        )
        if ph or pw:
            x = np.pad(x, ((0, ph), (0, pw), (0, 0)))
        logits = self._fwd(self.params, jnp.asarray(x[None]))
        return np.asarray(logits[0, :h, :w] > 0.0).astype(np.uint8)


def make_segmenter_train_step(model: PromptUNet, tx):
    """Jitted BCE + dice train step over ([B,H,W,4] inputs, [B,H,W] 0/1 targets).

    Dice matters here: the filter gates on mask IoU (> 0.7 vs the pasted
    label), and plain BCE is dominated by the easy background pixels — it
    plateaus with soft, over-inclusive boundaries. The dice term optimizes the
    overlap ratio the filter actually measures (same reasoning as the
    reference criterion's mask losses, which pair BCE with dice:
    ``mask2former/modeling/criterion.py`` loss_masks)."""

    @jax.jit
    def step(params, opt_state, x, target):
        def loss_fn(p):
            logits = model.apply({"params": p}, x)
            z = logits.astype(jnp.float32)
            # numerically stable sigmoid BCE
            bce = jnp.mean(
                jnp.maximum(z, 0) - z * target + jnp.log1p(jnp.exp(-jnp.abs(z)))
            )
            prob = jax.nn.sigmoid(z)
            inter = jnp.sum(prob * target, axis=(1, 2))
            denom = jnp.sum(prob, axis=(1, 2)) + jnp.sum(target, axis=(1, 2))
            dice = 1.0 - jnp.mean((2.0 * inter + 1.0) / (denom + 1.0))
            return bce + dice

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda a, u: a + u, params, updates)
        return params, opt_state, loss

    return step
