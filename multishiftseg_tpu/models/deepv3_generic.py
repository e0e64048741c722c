"""Generic DeepLabV3+ over ResNet / SEResNeXt trunks (the reference's ``DeepV3Plus``).

Behavioural port of ``lib/network/deepv3/deepv3.py:95-201`` and the model builders at
``:288-314`` (``DeepR50V3PlusD_m1``, ``DeepSRNX50V3PlusD_m1``, ...): trunk with the D
variant (dilation 2/4 in layer3/4, output stride 8), ASPP(2048 -> 256), m1 skip from
layer1 (256 -> 48), and a 3-conv final head. Unlike ``DeepWV3Plus`` this variant has
no OOD head — it is the closed-set baseline architecture.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from .deeplab import ASPP, ConvBNReLU
from .layers import Conv
from .resnet import ResNet
from .seresnext import SEResNeXt


class DeepV3Plus(nn.Module):
    num_classes: int = 19
    trunk: str = "resnet-50"  # resnet-50 | resnet-101 | seresnext-50 | seresnext-101
    skip_num: int = 48
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_size = (x.shape[1], x.shape[2])
        x = x.astype(self.dtype or x.dtype)

        if self.trunk.startswith("resnet"):
            # the closed-set baselines TRAIN their trunk BN (reference trains
            # DeepV3Plus with (Sync)BN); frozen stats are the M2F-backbone regime
            feats = ResNet(depth=int(self.trunk.split("-")[1]), output_stride=8,
                           trainable_bn=True, dtype=self.dtype,
                           name="trunk")(x, train=train)
            low = feats["res2"]  # stride 4 (m1 skip)
            top = feats["res5"]  # stride 8 (D variant)
        else:
            feats = SEResNeXt(depth=int(self.trunk.split("-")[1]), dtype=self.dtype,
                              name="trunk")(x, train=train)
            low = feats["layer1"]  # stride 4
            top = feats["layer4"]  # stride 8 (D variant)

        dec = ASPP(dtype=self.dtype, name="aspp")(top, train=train)
        dec0_up = Conv(256, (1, 1), dtype=self.dtype, name="bot_aspp")(dec)
        dec0_fine = Conv(self.skip_num, (1, 1), dtype=self.dtype, name="bot_fine")(low)
        dec0_up = resize_bilinear(dec0_up, (low.shape[1], low.shape[2]),
                                  align_corners=True)
        dec0 = jnp.concatenate([dec0_fine, dec0_up], axis=-1)

        f = ConvBNReLU(256, (3, 3), dtype=self.dtype, name="final_0")(dec0, train=train)
        f = ConvBNReLU(256, (3, 3), dtype=self.dtype, name="final_1")(f, train=train)
        logits = Conv(self.num_classes, (1, 1), dtype=self.dtype, name="final_cls")(f)
        return resize_bilinear(logits.astype(jnp.float32), in_size, align_corners=True)


def DeepR50V3PlusD_m1(num_classes: int = 19, dtype=None) -> DeepV3Plus:
    return DeepV3Plus(num_classes=num_classes, trunk="resnet-50", dtype=dtype)


def DeepSRNX50V3PlusD_m1(num_classes: int = 19, dtype=None) -> DeepV3Plus:
    return DeepV3Plus(num_classes=num_classes, trunk="seresnext-50", dtype=dtype)


def DeepSRNX101V3PlusD_m1(num_classes: int = 19, dtype=None) -> DeepV3Plus:
    return DeepV3Plus(num_classes=num_classes, trunk="seresnext-101", dtype=dtype)
