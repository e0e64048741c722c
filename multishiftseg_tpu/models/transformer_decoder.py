"""Mask2Anomaly transformer decoders: the GMA (global masked attention) variant with a
duplicate OOD classification head, plus the vanilla Mask2Former decoder.

Behavioural port of ``MultiScaleMaskedTransformerDecoder_GMA``
(``modeling/transformer_decoder/mask2former_transformer_decoder.py:280-573``):
9 layers of [GlobalCrossAttention(fg + bg) -> SelfAttention -> FFN] round-robining over
3 scales, learnable query features/embeddings (100 x 256), per-layer prediction heads
(``class_embed`` -> K+1, ``mask_embed`` MLP -> einsum with mask features) and OOD heads
using the duplicate ``class_embed2`` with the shared ``mask_embed``.

Masked attention here never materializes the torch [B*h, Q, HW] bool tensors — masks
are computed in-graph from the resized mask logits and consumed as additive bias.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from .attention import MultiheadAttention
from .layers import MLP
from .position_encoding import position_embedding_sine


class SelfAttentionLayer(nn.Module):
    d_model: int
    nheads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tgt, query_pos):
        q = tgt + query_pos
        out = MultiheadAttention(self.d_model, self.nheads, dtype=self.dtype,
                                 name="self_attn")(q, q, tgt)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(tgt + out)


class GlobalCrossAttentionLayer(nn.Module):
    """Foreground- and background-masked cross attentions, summed
    (reference ``GlobalCrossAttentionLayer.forward_post``, lines 99-121)."""

    d_model: int
    nheads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tgt, memory, mask_fg, mask_bg, pos, query_pos):
        q = tgt + query_pos
        k = memory + pos
        fg = MultiheadAttention(self.d_model, self.nheads, dtype=self.dtype,
                                name="multihead_attn_foreground")(q, k, memory, mask_fg)
        bg = MultiheadAttention(self.d_model, self.nheads, dtype=self.dtype,
                                name="multihead_attn_background")(q, k, memory, mask_bg)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(tgt + fg + bg)


class CrossAttentionLayer(nn.Module):
    d_model: int
    nheads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tgt, memory, mask, pos, query_pos):
        out = MultiheadAttention(self.d_model, self.nheads, dtype=self.dtype,
                                 name="multihead_attn")(tgt + query_pos, memory + pos,
                                                        memory, mask)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(tgt + out)


class FFNLayer(nn.Module):
    d_model: int
    dim_feedforward: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tgt):
        x = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(tgt)
        x = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(nn.relu(x))
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(tgt + x)


def _attn_masks_from_logits(outputs_mask, target_hw, num_heads):
    """Resize mask logits to the next attention resolution and derive fg/bg bool masks
    ([N, h, Q, HW]; True = disallowed), with sigmoid thresholds at 0.5."""
    m = resize_bilinear(
        outputs_mask.transpose(0, 2, 3, 1), target_hw, align_corners=False
    ).transpose(0, 3, 1, 2)  # [N, Q, H, W]
    prob = jax.nn.sigmoid(m.astype(jnp.float32))
    flat = prob.reshape(prob.shape[0], prob.shape[1], -1)[:, None]  # [N, 1, Q, HW]
    fg = jnp.broadcast_to(flat < 0.5, (flat.shape[0], num_heads) + flat.shape[2:])
    bg = jnp.broadcast_to(flat > 0.5, (flat.shape[0], num_heads) + flat.shape[2:])
    return fg, bg


class MultiScaleMaskedTransformerDecoderGMA(nn.Module):
    num_classes: int = 19
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9  # DEC_LAYERS - 1 (reference from_config, line 430)
    mask_dim: int = 256
    num_feature_levels: int = 3
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (self.num_queries, self.hidden_dim)
        )
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, self.hidden_dim)
        )
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.num_feature_levels, self.hidden_dim),
        )
        self.cross_layers = [
            GlobalCrossAttentionLayer(self.hidden_dim, self.nheads, dtype=self.dtype,
                                      name=f"cross_{i}")
            for i in range(self.dec_layers)
        ]
        self.self_layers = [
            SelfAttentionLayer(self.hidden_dim, self.nheads, dtype=self.dtype,
                               name=f"self_{i}")
            for i in range(self.dec_layers)
        ]
        self.ffn_layers = [
            FFNLayer(self.hidden_dim, self.dim_feedforward, dtype=self.dtype,
                     name=f"ffn_{i}")
            for i in range(self.dec_layers)
        ]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="decoder_norm")
        self.class_embed = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                                    name="class_embed")
        self.class_embed2 = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                                     name="class_embed2")
        self.mask_embed = MLP(self.hidden_dim, self.mask_dim, 3, dtype=self.dtype,
                              name="mask_embed")

    def _predict(self, output, mask_features, class_head):
        """class logits [N,Q,K+1] + mask logits [N,Q,H,W] from decoder state."""
        x = self.decoder_norm(output)
        outputs_class = class_head(x)
        mask_embed = self.mask_embed(x)  # [N, Q, mask_dim]
        outputs_mask = jnp.einsum(
            "nqc,nhwc->nqhw", mask_embed.astype(jnp.float32),
            mask_features.astype(jnp.float32),
        )
        return outputs_class, outputs_mask

    def __call__(
        self,
        x: Sequence[jax.Array],  # multi-scale features, low->high res (NHWC)
        mask_features: jax.Array,  # [N, H/4, W/4, mask_dim]
    ) -> Dict[str, jax.Array]:
        assert len(x) == self.num_feature_levels
        n = x[0].shape[0]
        srcs, poss, sizes = [], [], []
        for i in range(self.num_feature_levels):
            h, w = x[i].shape[1], x[i].shape[2]
            sizes.append((h, w))
            pe = position_embedding_sine(h, w, self.hidden_dim).astype(x[i].dtype)
            poss.append(jnp.broadcast_to(
                pe.reshape(1, h * w, self.hidden_dim), (n, h * w, self.hidden_dim)))
            srcs.append(
                x[i].reshape(n, h * w, self.hidden_dim)
                + self.level_embed[i].astype(x[i].dtype)
            )

        output = jnp.broadcast_to(
            self.query_feat[None], (n, self.num_queries, self.hidden_dim)
        ).astype(srcs[0].dtype)
        query_pos = jnp.broadcast_to(
            self.query_embed[None], (n, self.num_queries, self.hidden_dim)
        ).astype(srcs[0].dtype)

        pred_class: List[jax.Array] = []
        pred_mask: List[jax.Array] = []
        pred_class_ood: List[jax.Array] = []
        pred_mask_ood: List[jax.Array] = []

        outputs_class, outputs_mask = self._predict(output, mask_features, self.class_embed)
        mask_fg, mask_bg = _attn_masks_from_logits(outputs_mask, sizes[0], self.nheads)
        pred_class.append(outputs_class)
        pred_mask.append(outputs_mask)

        for i in range(self.dec_layers):
            li = i % self.num_feature_levels
            output = self.cross_layers[i](
                output, srcs[li], mask_fg, mask_bg, poss[li], query_pos
            )
            output = self.self_layers[i](output, query_pos)
            output = self.ffn_layers[i](output)

            next_size = sizes[(i + 1) % self.num_feature_levels]
            outputs_class, outputs_mask = self._predict(
                output, mask_features, self.class_embed
            )
            mask_fg, mask_bg = _attn_masks_from_logits(outputs_mask, next_size, self.nheads)
            outputs_class_ood, outputs_mask_ood = self._predict(
                output, mask_features, self.class_embed2
            )
            pred_class.append(outputs_class)
            pred_mask.append(outputs_mask)
            pred_class_ood.append(outputs_class_ood)
            pred_mask_ood.append(outputs_mask_ood)

        aux = [
            {"pred_logits": a, "pred_masks": b, "pred_logits_ood": c, "pred_masks_ood": d}
            for a, b, c, d in zip(
                pred_class[:-1], pred_mask[:-1], pred_class_ood[:-1], pred_mask_ood[:-1]
            )
        ]
        return {
            "pred_logits": pred_class[-1],
            "pred_masks": pred_mask[-1],
            "pred_logits_ood": pred_class_ood[-1],
            "pred_masks_ood": pred_mask_ood[-1],
            "aux_outputs": aux,
        }


class MultiScaleMaskedTransformerDecoder(nn.Module):
    """Vanilla Mask2Former decoder (single masked cross attention, no OOD head) —
    the registered non-anomaly alternative
    (reference ``mask2former_transformer_decoder.py:575-830``)."""

    num_classes: int = 19
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9
    mask_dim: int = 256
    num_feature_levels: int = 3
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (self.num_queries, self.hidden_dim)
        )
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, self.hidden_dim)
        )
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.num_feature_levels, self.hidden_dim),
        )
        self.cross_layers = [
            CrossAttentionLayer(self.hidden_dim, self.nheads, dtype=self.dtype,
                                name=f"cross_{i}")
            for i in range(self.dec_layers)
        ]
        self.self_layers = [
            SelfAttentionLayer(self.hidden_dim, self.nheads, dtype=self.dtype,
                               name=f"self_{i}")
            for i in range(self.dec_layers)
        ]
        self.ffn_layers = [
            FFNLayer(self.hidden_dim, self.dim_feedforward, dtype=self.dtype,
                     name=f"ffn_{i}")
            for i in range(self.dec_layers)
        ]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="decoder_norm")
        self.class_embed = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                                    name="class_embed")
        self.mask_embed = MLP(self.hidden_dim, self.mask_dim, 3, dtype=self.dtype,
                              name="mask_embed")

    def _predict(self, output, mask_features):
        x = self.decoder_norm(output)
        outputs_class = self.class_embed(x)
        mask_embed = self.mask_embed(x)
        outputs_mask = jnp.einsum(
            "nqc,nhwc->nqhw", mask_embed.astype(jnp.float32),
            mask_features.astype(jnp.float32),
        )
        return outputs_class, outputs_mask

    def __call__(self, x, mask_features):
        assert len(x) == self.num_feature_levels
        n = x[0].shape[0]
        srcs, poss, sizes = [], [], []
        for i in range(self.num_feature_levels):
            h, w = x[i].shape[1], x[i].shape[2]
            sizes.append((h, w))
            pe = position_embedding_sine(h, w, self.hidden_dim).astype(x[i].dtype)
            poss.append(jnp.broadcast_to(
                pe.reshape(1, h * w, self.hidden_dim), (n, h * w, self.hidden_dim)))
            srcs.append(
                x[i].reshape(n, h * w, self.hidden_dim)
                + self.level_embed[i].astype(x[i].dtype)
            )

        output = jnp.broadcast_to(
            self.query_feat[None], (n, self.num_queries, self.hidden_dim)
        ).astype(srcs[0].dtype)
        query_pos = jnp.broadcast_to(
            self.query_embed[None], (n, self.num_queries, self.hidden_dim)
        ).astype(srcs[0].dtype)

        pred_class, pred_mask = [], []
        outputs_class, outputs_mask = self._predict(output, mask_features)
        mask_fg, _ = _attn_masks_from_logits(outputs_mask, sizes[0], self.nheads)
        pred_class.append(outputs_class)
        pred_mask.append(outputs_mask)

        for i in range(self.dec_layers):
            li = i % self.num_feature_levels
            output = self.cross_layers[i](output, srcs[li], mask_fg, poss[li], query_pos)
            output = self.self_layers[i](output, query_pos)
            output = self.ffn_layers[i](output)
            outputs_class, outputs_mask = self._predict(output, mask_features)
            mask_fg, _ = _attn_masks_from_logits(
                outputs_mask, sizes[(i + 1) % self.num_feature_levels], self.nheads
            )
            pred_class.append(outputs_class)
            pred_mask.append(outputs_mask)

        aux = [
            {"pred_logits": a, "pred_masks": b}
            for a, b in zip(pred_class[:-1], pred_mask[:-1])
        ]
        return {
            "pred_logits": pred_class[-1],
            "pred_masks": pred_mask[-1],
            "aux_outputs": aux,
        }
