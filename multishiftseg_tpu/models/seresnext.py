"""SEResNeXt-50/101 trunks (squeeze-excitation + grouped bottlenecks).

Behavioural port of the reference's alternate DeepV3Plus trunks
(``lib/network/deepv3/SEresnext.py:69-406``): ResNeXt 32x4d bottlenecks with SE
blocks (reduction 16), stem conv7x7, layers (3,4,6,3) / (3,4,23,3). Used by the
``DeepSRNX50V3PlusD_m1`` / ``DeepSRNX101V3PlusD_m1`` model builders.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv


class SEBlock(nn.Module):
    reduction: int = 16
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))  # [N, C]
        s = nn.Dense(c // self.reduction, dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype, name="fc2")(s)
        s = jax.nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)
        return x * s[:, None, None, :]


class SEResNeXtBottleneck(nn.Module):
    """ResNeXt bottleneck (cardinality 32, base width 4) + SE."""

    planes: int  # output = planes * 4
    stride: int = 1
    dilation: int = 1
    cardinality: int = 32
    base_width: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = (self.planes * self.base_width // 64) * self.cardinality
        out_ch = self.planes * 4
        need_proj = x.shape[-1] != out_ch or self.stride != 1

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)

        shortcut = x
        if need_proj:
            shortcut = Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                            dtype=self.dtype, name="downsample")(x)
            shortcut = bn("downsample_bn")(shortcut)

        out = Conv(width, (1, 1), dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = Conv(width, (3, 3), strides=(self.stride,) * 2,
                   dilation=(self.dilation,) * 2, groups=self.cardinality,
                   dtype=self.dtype, name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = Conv(out_ch, (1, 1), dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        out = SEBlock(dtype=self.dtype, name="se")(out)
        return nn.relu(out + shortcut)


SERESNEXT_STAGES = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class SEResNeXt(nn.Module):
    """Trunk returning layer0..layer4 feature maps (layer1 = stride 4, ...)."""

    depth: int = 50
    output_stride: int = 8  # D variant: dilate layer3 (r2) and layer4 (r4)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        x = Conv(64, (7, 7), strides=(2, 2), padding=3, dtype=self.dtype,
                 name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = {"layer0": x}
        stages = SERESNEXT_STAGES[self.depth]
        planes = 64
        for stage_idx, blocks in enumerate(stages):
            if self.output_stride == 8 and stage_idx >= 2:
                stride = 1
                dilation = 2 if stage_idx == 2 else 4
            else:
                stride = 1 if stage_idx == 0 else 2
                dilation = 1
            for b in range(blocks):
                x = SEResNeXtBottleneck(
                    planes=planes, stride=stride if b == 0 else 1,
                    dilation=dilation, dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{b}",
                )(x, train=train)
            feats[f"layer{stage_idx + 1}"] = x
            planes *= 2
        return feats
