"""detectron2-style ResNet backbone (R-50 default) exposing res2..res5.

The shipped Mask2Anomaly model is ResNet-50-backboned (``anomaly_ft.yaml``:
``build_resnet_backbone``, DEPTH 50, STRIDE_IN_1X1 False, FREEZE_AT 5 — the whole
backbone is frozen during OOD fine-tuning, so BatchNorm here always runs in
running-average mode, matching detectron2's FrozenBatchNorm under freezing).

Layout NHWC; bottleneck strides live in the 3x3 conv (torchvision convention,
STRIDE_IN_1X1=False).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv


class FrozenBN(nn.Module):
    """Backbone BatchNorm. Frozen by default (running statistics only —
    detectron2's FrozenBatchNorm under the M2F FREEZE_AT regime); with
    ``trainable=True`` and ``train=True`` it behaves as normal training-mode
    BatchNorm (the reference's DeepV3Plus closed-set baselines train their
    trunk BN, ``deepv3.py:95-201``). The parameter/collection layout is
    identical either way, so converters are unaffected."""

    dtype: Optional[jnp.dtype] = None
    trainable: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not (self.trainable and train),
            momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(x)


class BottleneckBlock(nn.Module):
    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None
    trainable_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        need_proj = x.shape[-1] != self.out_channels or self.stride != 1
        shortcut = x
        if need_proj:
            shortcut = Conv(self.out_channels, (1, 1), strides=(self.stride,) * 2,
                            dtype=self.dtype, name="shortcut")(x)
            shortcut = FrozenBN(dtype=self.dtype, trainable=self.trainable_bn, name="shortcut_norm")(shortcut, train)
        out = Conv(self.bottleneck_channels, (1, 1), dtype=self.dtype, name="conv1")(x)
        out = nn.relu(FrozenBN(dtype=self.dtype, trainable=self.trainable_bn, name="norm1")(out, train))
        out = Conv(self.bottleneck_channels, (3, 3), strides=(self.stride,) * 2,
                   dilation=(self.dilation,) * 2, dtype=self.dtype, name="conv2")(out)
        out = nn.relu(FrozenBN(dtype=self.dtype, trainable=self.trainable_bn, name="norm2")(out, train))
        out = Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv3")(out)
        out = FrozenBN(dtype=self.dtype, trainable=self.trainable_bn, name="norm3")(out, train)
        return nn.relu(out + shortcut)


class BasicBlock(nn.Module):
    """3x3-3x3 residual block for ResNet-18/34 (reference ``Resnet.py``)."""

    out_channels: int
    stride: int = 1
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None
    trainable_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        need_proj = x.shape[-1] != self.out_channels or self.stride != 1
        shortcut = x
        if need_proj:
            shortcut = Conv(self.out_channels, (1, 1), strides=(self.stride,) * 2,
                            dtype=self.dtype, name="shortcut")(x)
            shortcut = FrozenBN(dtype=self.dtype, trainable=self.trainable_bn, name="shortcut_norm")(shortcut, train)
        out = Conv(self.out_channels, (3, 3), strides=(self.stride,) * 2,
                   dilation=(self.dilation,) * 2, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(FrozenBN(dtype=self.dtype, trainable=self.trainable_bn, name="norm1")(out, train))
        out = Conv(self.out_channels, (3, 3), dilation=(self.dilation,) * 2,
                   dtype=self.dtype, name="conv2")(out)
        out = FrozenBN(dtype=self.dtype, trainable=self.trainable_bn, name="norm2")(out, train)
        return nn.relu(out + shortcut)


RESNET_STAGES = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}
BASIC_BLOCK_DEPTHS = {18, 34}


class ResNet(nn.Module):
    """ResNet trunk returning {'res2': s4, 'res3': s8, 'res4', 'res5'}.

    ``output_stride=32`` is the detectron2 backbone used by Mask2Former;
    ``output_stride=8`` applies the DeepLab D-variant (dilation 2/4 + stride 1 in
    res4/res5, reference ``deepv3.py:128-137``).
    """

    depth: int = 50
    output_stride: int = 32
    dtype: Optional[jnp.dtype] = None
    # True = train-mode BatchNorm in the trunk (DeepV3Plus baselines);
    # False = frozen running stats (the M2F backbone regime)
    trainable_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        x = x.astype(self.dtype or x.dtype)
        x = Conv(64, (7, 7), strides=(2, 2), padding=3, dtype=self.dtype,
                 name="stem_conv1")(x)
        x = nn.relu(FrozenBN(dtype=self.dtype, trainable=self.trainable_bn, name="stem_norm1")(x, train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = {}
        stages = RESNET_STAGES[self.depth]
        basic = self.depth in BASIC_BLOCK_DEPTHS
        bottleneck = 64
        out_channels = 64 if basic else 256
        for stage_idx, num_blocks in enumerate(stages):
            stride = 1 if stage_idx == 0 else 2
            dilation = 1
            if self.output_stride == 8 and stage_idx >= 2:
                stride = 1
                dilation = 2 if stage_idx == 2 else 4
            for block_idx in range(num_blocks):
                block_stride = stride if block_idx == 0 else 1
                if basic:
                    x = BasicBlock(
                        out_channels=out_channels, stride=block_stride,
                        dilation=dilation, dtype=self.dtype,
                        trainable_bn=self.trainable_bn,
                        name=f"res{stage_idx + 2}_{block_idx}",
                    )(x, train)
                else:
                    x = BottleneckBlock(
                        bottleneck_channels=bottleneck,
                        out_channels=out_channels,
                        stride=block_stride,
                        dilation=dilation,
                        dtype=self.dtype,
                        trainable_bn=self.trainable_bn,
                        name=f"res{stage_idx + 2}_{block_idx}",
                    )(x, train)
            feats[f"res{stage_idx + 2}"] = x
            bottleneck *= 2
            out_channels *= 2
        return feats


RESNET_FEATURE_CHANNELS = {"res2": 256, "res3": 512, "res4": 1024, "res5": 2048}
RESNET_FEATURE_STRIDES = {"res2": 4, "res3": 8, "res4": 16, "res5": 32}
