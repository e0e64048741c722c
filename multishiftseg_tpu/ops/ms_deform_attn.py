"""Multi-scale deformable attention (the reference's hand-written CUDA op, rebuilt
for TPU).

The reference implements this as ``MSDeformAttnFunction`` backed by
``ms_deformable_im2col_gpu_kernel`` + six backward-kernel variants
(``lib/network/mask2former/modeling/pixel_decoder/ops/``, ~1.7k LoC CUDA), with a
pure-PyTorch ``grid_sample`` fallback (``ms_deform_attn_func.py:52-72``).

Here the op is a pure XLA expression: per level, a bilinear gather of 4 corners via
``take_along_axis`` + weighted sum over (levels x points). XLA differentiates it (the
scatter-add backward the CUDA code hand-writes falls out of the gather VJP), fuses the
surrounding projections, and batches freely — no ``im2col_step`` staging needed. A
Pallas kernel for the forward gather lives in ``ops/ms_deform_attn_pallas.py``.

Layout conventions (differ from the reference's [N, S, M, D] torch layout only in that
everything stays channels-last):
  value:               [N, S, M, D]  (S = sum_l H_l*W_l)
  sampling_locations:  [N, Lq, M, L, P, 2]  normalized [0, 1], (x, y)
  attention_weights:   [N, Lq, M, L, P]  (softmax-normalized over L*P by the module)
  output:              [N, Lq, M*D]
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def ms_deform_attn_core(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    """Pure-XLA multi-scale deformable attention.

    Matches ``grid_sample(mode='bilinear', padding_mode='zeros', align_corners=False)``
    per level: sample x = loc_x * W - 0.5 in pixel space, OOB corners contribute 0.
    """
    n, s, m, d = value.shape
    _, lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)

    compute_dtype = value.dtype
    loc = sampling_locations.astype(jnp.float32)
    w_attn = attention_weights.astype(compute_dtype)

    out = jnp.zeros((n, lq, m, d), dtype=jnp.float32)
    start = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        v = value[:, start : start + h * w]  # [N, HW, M, D]
        start += h * w
        # [N, M, HW, D] -> [N*M, H, W, D]
        v = v.transpose(0, 2, 1, 3).reshape(n * m, h, w, d)
        x = loc[:, :, :, lid, :, 0] * w - 0.5  # [N, Lq, M, P]
        y = loc[:, :, :, lid, :, 1] * h - 0.5
        # -> [N*M, Lq*P]
        x = x.transpose(0, 2, 1, 3).reshape(n * m, lq * P)
        y = y.transpose(0, 2, 1, 3).reshape(n * m, lq * P)
        sampled = _bilinear_gather(v, x, y)  # [N*M, Lq*P, D]
        sampled = sampled.reshape(n, m, lq, P, d)
        wl = w_attn[:, :, :, lid].transpose(0, 2, 1, 3)  # [N, M, Lq, P]
        out = out + jnp.einsum(
            "nmqp,nmqpd->nqmd", wl.astype(jnp.float32), sampled.astype(jnp.float32)
        )
    return out.reshape(n, lq, m * d).astype(compute_dtype)


def _bilinear_gather(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Zero-padded bilinear gather. img [B, H, W, D]; x, y [B, Q] pixel coords."""
    b, h, w, d = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = img.reshape(b, h * w, d)

    def corner(ix, iy):
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
        v = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return v * valid[..., None].astype(v.dtype)

    wx = wx.astype(img.dtype)
    wy = wy.astype(img.dtype)
    v00 = corner(x0i, y0i)
    v01 = corner(x0i + 1, y0i)
    v10 = corner(x0i, y0i + 1)
    v11 = corner(x0i + 1, y0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _sampling_offsets_bias_init(n_heads: int, n_levels: int, n_points: int) -> np.ndarray:
    """Directional grid init for the offset head bias (the reference's
    ``MSDeformAttn._reset_parameters``, ``ops/modules/ms_deform_attn.py:66-74``)."""
    thetas = np.arange(n_heads, dtype=np.float64) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # [M, 2]
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1).astype(np.float32)


class MSDeformAttn(nn.Module):
    """Deformable attention module: offset/weight heads + value/output projections.

    Behavioural port of ``ops/modules/ms_deform_attn.py:34-125`` (d_model 256, 8 heads,
    4 points), operating on static ``spatial_shapes``.
    """

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # [N, Lq, C]
        reference_points: jax.Array,  # [N, Lq, L, 2] in [0, 1]
        input_flatten: jax.Array,  # [N, S, C]
        spatial_shapes: Sequence[Tuple[int, int]],
    ) -> jax.Array:
        n, lq, _ = query.shape
        m, L, P = self.n_heads, self.n_levels, self.n_points
        d = self.d_model // m

        value = nn.Dense(
            self.d_model, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="value_proj",
        )(input_flatten)
        value = value.reshape(n, -1, m, d)

        offsets = nn.Dense(
            m * L * P * 2, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                _sampling_offsets_bias_init(m, L, P), dtype
            ),
            name="sampling_offsets",
        )(query).reshape(n, lq, m, L, P, 2)

        attn = nn.Dense(
            m * L * P, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(n, lq, m, L * P)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).reshape(n, lq, m, L, P)

        normalizer = jnp.asarray(
            [[w, h] for (h, w) in spatial_shapes], jnp.float32
        )  # [L, 2] (x, y) order
        loc = (
            reference_points[:, :, None, :, None, :].astype(jnp.float32)
            + offsets.astype(jnp.float32) / normalizer[None, None, None, :, None, :]
        )

        out = ms_deform_attn_core(value, spatial_shapes, loc, attn.astype(value.dtype))
        return nn.Dense(
            self.d_model, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="output_proj",
        )(out)
