"""MaskFormer-v1 decoder: DETR-style transformer decoder over a single feature map.

Behavioural port of the registered ``StandardTransformerDecoder`` + DETR
``Transformer`` decoder stack (reference ``maskformer_transformer_decoder.py:30-188``,
``transformer.py:19-369``): learned query embeddings cross-attend to the (transformer-
encoded) top feature map; class head + mask-embed MLP einsum against mask features.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import MultiheadAttention
from .layers import MLP
from .position_encoding import position_embedding_sine


class DETRDecoderLayer(nn.Module):
    d_model: int = 256
    nheads: int = 8
    dim_feedforward: int = 2048
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos):
        q = tgt + query_pos
        sa = MultiheadAttention(self.d_model, self.nheads, dtype=self.dtype,
                                name="self_attn")(q, q, tgt)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt + sa)
        ca = MultiheadAttention(self.d_model, self.nheads, dtype=self.dtype,
                                name="multihead_attn")(
            tgt + query_pos, memory + pos, memory)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt + ca)
        ffn = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(tgt)
        ffn = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(nn.relu(ffn))
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt + ffn)


class StandardTransformerDecoder(nn.Module):
    """MaskFormer-v1 predictor over (features, mask_features)."""

    num_classes: int = 19
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 6
    mask_dim: int = 256
    deep_supervision: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, mask_features: jax.Array) -> Dict[str, jax.Array]:
        """x: [N, H, W, C] top feature map; mask_features: [N, H4, W4, mask_dim]."""
        n, h, w, c = x.shape
        if c != self.hidden_dim:
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="input_proj")(x)
        memory = x.reshape(n, h * w, self.hidden_dim)
        pe = position_embedding_sine(h, w, self.hidden_dim).astype(memory.dtype)
        pos = jnp.broadcast_to(pe.reshape(1, h * w, -1), memory.shape)

        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.hidden_dim),
        )
        query_pos = jnp.broadcast_to(
            query_embed[None], (n, self.num_queries, self.hidden_dim)
        ).astype(memory.dtype)
        tgt = jnp.zeros_like(query_pos)

        class_embed = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                               name="class_embed")
        mask_embed = MLP(self.hidden_dim, self.mask_dim, 3, dtype=self.dtype,
                         name="mask_embed")
        decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="decoder_norm")

        outs = []
        for i in range(self.dec_layers):
            tgt = DETRDecoderLayer(
                self.hidden_dim, self.nheads, self.dim_feedforward,
                dtype=self.dtype, name=f"layer_{i}",
            )(tgt, memory, pos, query_pos)
            dec = decoder_norm(tgt)
            cls = class_embed(dec)
            emb = mask_embed(dec)
            masks = jnp.einsum(
                "nqc,nhwc->nqhw", emb.astype(jnp.float32),
                mask_features.astype(jnp.float32),
            )
            outs.append({"pred_logits": cls, "pred_masks": masks})

        return {
            "pred_logits": outs[-1]["pred_logits"],
            "pred_masks": outs[-1]["pred_masks"],
            "aux_outputs": outs[:-1] if self.deep_supervision else [],
        }
