"""DeepLabV3+ on WideResNet-38 with a per-pixel energy-scored OOD head.

Re-implements the behaviour of the reference ``DeepWV3Plus``
(``lib/network/deepv3/deepv3.py:203-285``): WRN-38 trunk (output stride 8) -> ASPP
(4096->256, rates 12/24/36 + image pooling, concat 1280) -> ``bot_aspp`` 1280->256,
``bot_fine`` 128->48 skip from mod2, 3-conv ``final`` head to 19 classes, plus a
duplicate 1x1 ``ood_head`` whose negative ``logsumexp`` energy is the anomaly score.

Outputs NHWC logits [N, H, W, 19] and anomaly scores [N, H, W], both bilinearly
upsampled (align_corners=True, matching the reference ``mynn.Upsample``) to the input
resolution.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from ..ops.scores import energy_score
from .layers import BNReLU, Conv, global_avg_pool
from .wider_resnet import WiderResNetA2


class ConvBNReLU(nn.Module):
    features: int
    kernel_size: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.features, self.kernel_size, dilation=self.dilation,
                 dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (reference ``deepv3.py:35-92``), OS-8 rates."""

    reduction_dim: int = 256
    rates: Tuple[int, ...] = (12, 24, 36)  # 2x (6,12,18) for output_stride=8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = (x.shape[1], x.shape[2])
        img = global_avg_pool(x)
        img = ConvBNReLU(self.reduction_dim, (1, 1), dtype=self.dtype,
                         name="img_conv")(img, train=train)
        img = jnp.broadcast_to(
            img, (x.shape[0], size[0], size[1], self.reduction_dim)
        ).astype(img.dtype)

        branches = [img]
        branches.append(
            ConvBNReLU(self.reduction_dim, (1, 1), dtype=self.dtype,
                       name="features_0")(x, train=train)
        )
        for i, r in enumerate(self.rates):
            branches.append(
                ConvBNReLU(self.reduction_dim, (3, 3), dilation=(r, r),
                           dtype=self.dtype, name=f"features_{i + 1}")(x, train=train)
            )
        return jnp.concatenate(branches, axis=-1)  # [N, H, W, 5*256]


class DeepWV3Plus(nn.Module):
    """WideResNet-38 DeepLabV3+ with dual classification / OOD heads.

    ``trunk_structure``/``trunk_channels`` default to WRN-38; overriding them yields a
    tiny model through the same code path (used by sharding dry-runs)."""

    num_classes: int = 19
    trunk_structure: Optional[tuple] = None
    trunk_channels: Optional[tuple] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_size = (x.shape[1], x.shape[2])
        x = x.astype(self.dtype or x.dtype)

        trunk_kwargs = {}
        if self.trunk_structure is not None:
            trunk_kwargs["structure"] = self.trunk_structure
        if self.trunk_channels is not None:
            trunk_kwargs["channels"] = self.trunk_channels
        m2, trunk_out = WiderResNetA2(
            dtype=self.dtype, name="trunk", **trunk_kwargs
        )(x, train=train)

        dec = ASPP(dtype=self.dtype, name="aspp")(trunk_out, train=train)
        dec0_up = Conv(256, (1, 1), dtype=self.dtype, name="bot_aspp")(dec)
        dec0_fine = Conv(48, (1, 1), dtype=self.dtype, name="bot_fine")(m2)
        dec0_up = resize_bilinear(dec0_up, (m2.shape[1], m2.shape[2]), align_corners=True)
        dec0 = jnp.concatenate([dec0_fine, dec0_up], axis=-1)

        f = ConvBNReLU(256, (3, 3), dtype=self.dtype, name="final_0")(dec0, train=train)
        feature = ConvBNReLU(256, (3, 3), dtype=self.dtype, name="final_1")(f, train=train)

        dec1 = Conv(self.num_classes, (1, 1), dtype=self.dtype, name="final_cls")(feature)
        logit = resize_bilinear(
            dec1.astype(jnp.float32), in_size, align_corners=True
        )

        dec2 = Conv(self.num_classes, (1, 1), dtype=self.dtype, name="ood_head")(feature)
        # Energy in fp32, then upsample the scalar map (cheap) instead of the logits.
        score = energy_score(dec2)[..., None]
        anomaly_score = resize_bilinear(score, in_size, align_corners=True)[..., 0]

        return anomaly_score, logit


def init_ood_head_from_final(params):
    """Copy the trained classifier kernel into the OOD head (the reference's
    ``uncertainty_func_init``, ``deepv3.py:255-256``). Pure function on the param tree."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    src = flat[("final_cls", "conv", "kernel")]
    flat[("ood_head", "conv", "kernel")] = src
    return flax.traverse_util.unflatten_dict(flat)
