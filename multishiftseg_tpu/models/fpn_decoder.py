"""FPN pixel decoders — the registered non-deformable alternatives.

Behavioural ports of ``modeling/pixel_decoder/fpn.py:37-312``:
* ``BasePixelDecoder`` — plain top-down FPN over res2-5 (1x1 lateral + 3x3 output
  convs with GN, nearest fusion upsampling per ``fpn.py:149``);
* ``TransformerEncoderPixelDecoder`` — MaskFormer-v1 variant that runs a DETR
  transformer encoder on res5 before the FPN top-down pass.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_nearest
from .attention import MultiheadAttention
from .layers import Conv
from .position_encoding import position_embedding_sine


class TransformerEncoderLayer(nn.Module):
    """DETR encoder layer (post-norm), reference ``transformer.py``."""

    d_model: int = 256
    nheads: int = 8
    dim_feedforward: int = 2048
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, src, pos):
        q = src + pos
        attn = MultiheadAttention(self.d_model, self.nheads, dtype=self.dtype,
                                  name="self_attn")(q, q, src)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src + attn)
        ffn = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(src)
        ffn = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(nn.relu(ffn))
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src + ffn)


class BasePixelDecoder(nn.Module):
    """Plain FPN: project res5, fuse res4..res2 top-down, emit mask features at
    stride 4 and the three coarsest maps as multi-scale features."""

    conv_dim: int = 256
    mask_dim: int = 256
    in_features: Tuple[str, ...] = ("res2", "res3", "res4", "res5")
    num_outputs: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, features: Dict[str, jax.Array]):
        names = list(self.in_features)[::-1]  # res5 -> res2
        outs = []
        y = None
        for idx, name in enumerate(names):
            x = features[name]
            if idx == 0:
                y = Conv(self.conv_dim, (3, 3), dtype=self.dtype,
                         name=f"layer_{len(names) - idx}")(x)
                y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                                 name=f"layer_{len(names) - idx}_gn")(y)
                y = nn.relu(y)
            else:
                lateral = Conv(self.conv_dim, (1, 1), dtype=self.dtype,
                               name=f"adapter_{len(names) - idx}")(x)
                lateral = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                                       name=f"adapter_{len(names) - idx}_gn")(lateral)
                # "Following FPN implementation, we use nearest upsampling here"
                # (fpn.py:149 — unlike the msdeformattn FPN step, which is bilinear)
                up = resize_nearest(y, (x.shape[1], x.shape[2]))
                y = lateral + up
                y = Conv(self.conv_dim, (3, 3), dtype=self.dtype,
                         name=f"layer_{len(names) - idx}")(y)
                y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                                 name=f"layer_{len(names) - idx}_gn")(y)
                y = nn.relu(y)
            outs.append(y)

        mask_features = Conv(self.mask_dim, (3, 3), use_bias=True, dtype=self.dtype,
                             name="mask_features")(outs[-1])
        return mask_features, outs[0], outs[: self.num_outputs]


class TransformerEncoderPixelDecoder(nn.Module):
    """MaskFormer-v1 pixel decoder: DETR encoder on projected res5 + FPN."""

    conv_dim: int = 256
    mask_dim: int = 256
    transformer_enc_layers: int = 6
    nheads: int = 8
    dim_feedforward: int = 2048
    in_features: Tuple[str, ...] = ("res2", "res3", "res4", "res5")
    num_outputs: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, features: Dict[str, jax.Array]):
        top = features[self.in_features[-1]]
        n, h, w, _ = top.shape
        src = Conv(self.conv_dim, (1, 1), use_bias=True, dtype=self.dtype,
                   name="input_proj")(top)
        pe = position_embedding_sine(h, w, self.conv_dim).astype(src.dtype)
        tokens = src.reshape(n, h * w, self.conv_dim)
        pos = jnp.broadcast_to(pe.reshape(1, h * w, self.conv_dim), tokens.shape)
        for i in range(self.transformer_enc_layers):
            tokens = TransformerEncoderLayer(
                self.conv_dim, self.nheads, self.dim_feedforward,
                dtype=self.dtype, name=f"encoder_layer_{i}",
            )(tokens, pos)
        transformed = tokens.reshape(n, h, w, self.conv_dim)

        feats = dict(features)
        feats[self.in_features[-1]] = transformed
        fpn = BasePixelDecoder(
            conv_dim=self.conv_dim, mask_dim=self.mask_dim,
            in_features=self.in_features, num_outputs=self.num_outputs,
            dtype=self.dtype, name="fpn",
        )
        mask_features, _, multi_scale = fpn(feats)
        return mask_features, transformed, multi_scale
