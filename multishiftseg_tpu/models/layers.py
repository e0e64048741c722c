"""Shared flax building blocks (NHWC, bf16-aware).

Conventions:
* All tensors are NHWC (TPU-native); torch checkpoints are transposed on load by
  ``convert/torch2jax.py``.
* ``dtype`` is the computation dtype (bf16 on TPU by default at inference/training),
  ``param_dtype`` stays fp32.
* BatchNorm matches torch defaults (eps 1e-5, running-stat momentum 0.1 == flax
  momentum 0.9). Under pjit with a batch-sharded input, batch statistics are computed
  over the *global* batch (XLA inserts the cross-replica reduction), which subsumes the
  reference's SyncBN mentions (``train_m2f.py:237``).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


class Conv(nn.Module):
    """3x3/1x1 convolution with torch-compatible hyper-parameters."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    padding: Union[str, int, None] = None  # None -> dilation-preserving "same-ish"
    use_bias: bool = False
    groups: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        # Large-dilation 3x3 convs (ASPP rates 12/24/36) lower poorly in XLA:TPU
        # (~12% MFU measured on v5e); nine shifted dense matmuls are exact and
        # MXU-bound. The child is named "conv" with a "kernel" param so checkpoint
        # paths are identical to the nn.Conv branch.
        if (
            self.kernel_size == (3, 3)
            and self.dilation[0] >= 8
            and self.dilation == (self.dilation[0], self.dilation[0])
            and self.strides == (1, 1)
            and self.groups == 1
            and not self.use_bias
            and self.padding is None
        ):
            return _ShiftedDilatedConv(
                features=self.features, rate=self.dilation[0], dtype=self.dtype,
                name="conv",
            )(x)

        if self.padding is None:
            pad = tuple(
                d * (k // 2) for k, d in zip(self.kernel_size, self.dilation)
            )
            padding = [(p, p) for p in pad]
        elif isinstance(self.padding, int):
            padding = [(self.padding, self.padding)] * 2
        else:
            padding = self.padding
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            kernel_dilation=self.dilation,
            padding=padding,
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            dtype=self.dtype,
            kernel_init=nn.initializers.he_normal(),
            name="conv",
        )(x)


class _ShiftedDilatedConv(nn.Module):
    """3x3 dilated conv as 9 shifted matmuls (see ops/dilated_conv.py)."""

    features: int
    rate: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        from ..ops.dilated_conv import dilated_conv3x3

        kernel = self.param(
            "kernel", nn.initializers.he_normal(), (3, 3, x.shape[-1], self.features)
        )
        return dilated_conv3x3(x, kernel.astype(self.dtype or x.dtype), self.rate)


class BatchNorm(nn.Module):
    features: int  # kept for introspection; flax infers from input
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)


class BNReLU(nn.Module):
    """Pre-activation norm+ReLU (the reference's ``bnrelu``,
    ``lib/network/deepv3/wider_resnet.py:43-48``)."""

    features: int = 0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.relu(x)


def max_pool_3x3_s2(x):
    """torch ``MaxPool2d(3, stride=2, padding=1)`` on NHWC."""
    return nn.max_pool(
        x, window_shape=(3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
    )


def global_avg_pool(x):
    """[N, H, W, C] -> [N, 1, 1, C]."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


class Dropout2d(nn.Module):
    """Channel dropout (torch ``Dropout2d``): drops whole feature maps."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Dropout(rate=self.rate, broadcast_dims=(1, 2), deterministic=not train)(x)


class MLP(nn.Module):
    """Simple relu MLP head (reference ``mask2former_transformer_decoder.py:266-278``)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            is_last = i == self.num_layers - 1
            x = nn.Dense(
                self.output_dim if is_last else self.hidden_dim,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x)
            if not is_last:
                x = nn.relu(x)
        return x
