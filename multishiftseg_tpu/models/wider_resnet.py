"""WideResNet-38 (A2 variant) trunk, pre-activation identity-residual blocks.

Re-implements the behaviour of the reference trunk
(``lib/network/deepv3/wider_resnet.py:64-396``): structure [3, 3, 6, 3, 1, 1], channels
up to 4096, max-pool downsampling before mod2/mod3, stride-2 first block in mod4, and —
in dilated mode — dilation 2 in mod5, dilation 4 in mod6/mod7 (output stride 8), with
channel dropout p=0.3 / 0.5 in mod6 / mod7.

Everything is NHWC flax; the heavy 2048/4096-channel convolutions are where the MXU
FLOPs go, so the module takes a ``dtype`` (bf16 by default from the caller) while
parameters stay fp32.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import BNReLU, Conv, Dropout2d, max_pool_3x3_s2


class IdentityResidualBlock(nn.Module):
    """Pre-activation residual block; 2-conv wide variant or 1-3-1 bottleneck."""

    channels: Tuple[int, ...]  # (c1, c2) or (c1, c2, c3)
    stride: int = 1
    dilation: int = 1
    dropout_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        chans = tuple(self.channels)
        is_bottleneck = len(chans) == 3
        in_channels = x.shape[-1]
        need_proj = self.stride != 1 or in_channels != chans[-1]

        bn1 = BNReLU(dtype=self.dtype, name="bn1")(x, train=train)
        shortcut = (
            Conv(chans[-1], (1, 1), strides=(self.stride, self.stride),
                 dtype=self.dtype, name="proj_conv")(bn1)
            if need_proj
            else x
        )

        d = (self.dilation, self.dilation)
        if not is_bottleneck:
            out = Conv(chans[0], (3, 3), strides=(self.stride, self.stride),
                       dilation=d, dtype=self.dtype, name="convs_conv1")(bn1)
            out = BNReLU(dtype=self.dtype, name="convs_bn2")(out, train=train)
            if self.dropout_rate > 0:
                out = Dropout2d(self.dropout_rate)(out, train=train)
            out = Conv(chans[1], (3, 3), dilation=d, dtype=self.dtype,
                       name="convs_conv2")(out)
        else:
            out = Conv(chans[0], (1, 1), strides=(self.stride, self.stride),
                       dtype=self.dtype, name="convs_conv1")(bn1)
            out = BNReLU(dtype=self.dtype, name="convs_bn2")(out, train=train)
            out = Conv(chans[1], (3, 3), dilation=d, dtype=self.dtype,
                       name="convs_conv2")(out)
            out = BNReLU(dtype=self.dtype, name="convs_bn3")(out, train=train)
            if self.dropout_rate > 0:
                out = Dropout2d(self.dropout_rate)(out, train=train)
            out = Conv(chans[2], (1, 1), dtype=self.dtype, name="convs_conv3")(out)

        return out + shortcut


# (structure, per-module channels) of WRN-38-A2 — wider_resnet.py:316-317,384.
WRN38_STRUCTURE = (3, 3, 6, 3, 1, 1)
WRN38_CHANNELS = (
    (128, 128),
    (256, 256),
    (512, 512),
    (512, 1024),
    (512, 1024, 2048),
    (1024, 2048, 4096),
)


class WiderResNetA2(nn.Module):
    """Dilated WRN trunk exposing (mod2_out, final_out) for DeepLabV3+ skips.

    ``structure``/``channels``/``stem_width`` are overridable so sharding dry-runs and
    unit tests can instantiate a tiny trunk through the identical code path.
    """

    structure: Sequence[int] = WRN38_STRUCTURE
    channels: Sequence[Tuple[int, ...]] = WRN38_CHANNELS
    stem_width: int = 64
    dilation: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.stem_width, (3, 3), dtype=self.dtype, name="mod1_conv1")(x)

        feats = {}
        for mod_id, num_blocks in enumerate(self.structure):
            if mod_id < 2:
                x = max_pool_3x3_s2(x)
            for block_id in range(num_blocks):
                if self.dilation:
                    dil = 2 if mod_id == 3 else (4 if mod_id > 3 else 1)
                    stride = 2 if (block_id == 0 and mod_id == 2) else 1
                else:
                    dil = 1
                    stride = 2 if (block_id == 0 and 2 <= mod_id <= 4) else 1
                drop = 0.3 if mod_id == 4 else (0.5 if mod_id == 5 else 0.0)
                x = IdentityResidualBlock(
                    channels=tuple(self.channels[mod_id]),
                    stride=stride,
                    dilation=dil,
                    dropout_rate=drop,
                    dtype=self.dtype,
                    name=f"mod{mod_id + 2}_block{block_id + 1}",
                )(x, train=train)
            feats[f"mod{mod_id + 2}"] = x

        return feats["mod2"], x
