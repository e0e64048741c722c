"""Multi-scale deformable attention (the reference's hand-written CUDA op, rebuilt
for TPU).

The reference implements this as ``MSDeformAttnFunction`` backed by
``ms_deformable_im2col_gpu_kernel`` + six backward-kernel variants
(``lib/network/mask2former/modeling/pixel_decoder/ops/``, ~1.7k LoC CUDA), with a
pure-PyTorch ``grid_sample`` fallback (``ms_deform_attn_func.py:52-72``).

Here the op is a pure XLA expression: per level, one clamped 2x2-window patch gather
per sample point + a bf16 weighted reduction (see ``_core_forward`` for the measured
TPU design notes), with a hand-written VJP (``_core_vjp_bwd``) playing the role of the
reference's six CUDA backward kernels — XLA's derived adjoint is ~50x slower and
memory-unbounded. No ``im2col_step`` staging is needed under jit.

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
    """Multi-scale deformable attention with a hand-written backward.

    XLA's autodiff of the window gather lowers its adjoint to a serial ``while``
    scatter (~7.8 s per encoder layer at training shapes, measured); the custom VJP
    below expresses the same adjoint as vmapped row scatter-adds (~100x faster).
    """
    return _ms_deform_attn_core_vjp(tuple(spatial_shapes), value,
                                    sampling_locations, attention_weights)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ms_deform_attn_core_vjp(spatial_shapes, value, sampling_locations,
                             attention_weights):
    return _core_forward(spatial_shapes, value, sampling_locations, attention_weights)


def _core_forward(
    spatial_shapes: Sequence[Tuple[int, int]],
    value: jax.Array,
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    """Pure-XLA multi-scale deformable attention forward.

    Matches ``grid_sample(mode='bilinear', padding_mode='zeros', align_corners=False)``
    per level: sample x = loc_x * W - 0.5 in pixel space, OOB corners contribute 0.

    TPU design notes (measured on v5e at 1024x2048 eval shapes):
      * gather cost is per-index (~10 ns): a 2x2xD patch gather per sample point is
        ~2.5x faster than four [1, D] row gathers, and ~25x faster than the
        element-broadcast ``take_along_axis`` form;
      * the weighted reduction multiplies in bf16 and accumulates in fp32 — an fp32
        patch upcast doubles the traffic, and an einsum becomes a batched 1x16 x 16xD
        matmul wasting >99% of the 128x128 MXU.
    """
    n, s, m, d = value.shape
    _, lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)

    compute_dtype = value.dtype
    loc = sampling_locations.astype(jnp.float32)

    # [N, S, M, D] -> [N*M, S, D] once per layer (22 MB at eval shapes).
    v = value.transpose(0, 2, 1, 3).reshape(n * m, s, d)
    # [N, Lq, M, L, P] -> [N*M, Lq, L, P]
    loc_m = loc.transpose(0, 2, 1, 3, 4, 5).reshape(n * m, lq, L, P, 2)
    attn_m = (
        attention_weights.astype(jnp.float32)
        .transpose(0, 2, 1, 3, 4)
        .reshape(n * m, lq, L, P)
    )

    out = jnp.zeros((n * m, lq, d), jnp.float32)
    start = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        x = loc_m[:, :, lid, :, 0] * w - 0.5  # [N*M, Lq, P]
        y = loc_m[:, :, lid, :, 1] * h - 0.5
        # Clamped 2x2-window start: one gathered patch covers all 4 bilinear corners,
        # quartering the index count (TPU gather cost is per-index, measured ~8-14 ns).
        sy = jnp.clip(jnp.floor(y), 0, h - 2).astype(jnp.int32)
        sx = jnp.clip(jnp.floor(x), 0, w - 2).astype(jnp.int32)
        patches = _window_gather(
            v[:, start : start + h * w].reshape(n * m, h, w, d), sy, sx
        )  # [N*M, Lq, P, 2, 2, D]
        # Patch-position weights reproduce grid_sample zero-padding exactly:
        # position (i, j) at absolute (sy+i, sx+j) gets relu(1-|y-(sy+i)|) etc.;
        # OOB sample positions are >1 away from every in-window position -> weight 0.
        pos = jnp.arange(2, dtype=jnp.float32)
        wy = jax.nn.relu(1.0 - jnp.abs(y[..., None] - (sy[..., None] + pos)))
        wx = jax.nn.relu(1.0 - jnp.abs(x[..., None] - (sx[..., None] + pos)))
        wgt = (
            wy[..., :, None] * wx[..., None, :] * attn_m[:, :, lid, :, None, None]
        )  # [N*M, Lq, P, 2, 2]
        # bf16 product with fp32 accumulation: a fp32 upcast of the patches would
        # add ~700 MB of traffic per level at eval shapes (measured 2x cost).
        out = out + jnp.sum(
            wgt.astype(compute_dtype)[..., None] * patches,
            axis=(2, 3, 4),
            dtype=jnp.float32,
        )
        start += h * w
    return (
        out.reshape(n, m, lq, d).transpose(0, 2, 1, 3).reshape(n, lq, m * d)
    ).astype(compute_dtype)


def _core_vjp_fwd(spatial_shapes, value, sampling_locations, attention_weights):
    out = _core_forward(spatial_shapes, value, sampling_locations, attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _core_vjp_bwd(spatial_shapes, residuals, g):
    """Hand-written adjoint: regather patches (gathers are fast), compute the
    attention/location grads with dense algebra, and scatter the value grad as
    vmapped row adds (the reference hand-writes six CUDA kernels for this,
    ``ms_deform_im2col_cuda.cuh:306-927``; XLA's derived scatter is ~100x slower
    than this formulation on TPU)."""
    value, sampling_locations, attention_weights = residuals
    n, s, m, d = value.shape
    _, lq, _, L, P, _ = sampling_locations.shape

    loc = sampling_locations.astype(jnp.float32)
    v = value.transpose(0, 2, 1, 3).reshape(n * m, s, d)
    loc_m = loc.transpose(0, 2, 1, 3, 4, 5).reshape(n * m, lq, L, P, 2)
    attn_m = (
        attention_weights.astype(jnp.float32)
        .transpose(0, 2, 1, 3, 4)
        .reshape(n * m, lq, L, P)
    )
    gq = (
        g.astype(jnp.float32)
        .reshape(n, lq, m, d)
        .transpose(0, 2, 1, 3)
        .reshape(n * m, lq, d)
    )

    dv = jnp.zeros((n * m, s, d), jnp.float32)
    dattn_l = []
    dloc_l = []
    ii = jnp.arange(2)
    pos = jnp.arange(2, dtype=jnp.float32)
    start = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        x = loc_m[:, :, lid, :, 0] * w - 0.5
        y = loc_m[:, :, lid, :, 1] * h - 0.5
        sy = jnp.clip(jnp.floor(y), 0, h - 2).astype(jnp.int32)
        sx = jnp.clip(jnp.floor(x), 0, w - 2).astype(jnp.int32)
        patches = _window_gather(
            v[:, start : start + h * w].reshape(n * m, h, w, d), sy, sx
        ).astype(jnp.float32)  # [nm, lq, P, 2, 2, D]

        ddy = y[..., None] - (sy[..., None] + pos)  # [nm, lq, P, 2]
        ddx = x[..., None] - (sx[..., None] + pos)
        wy = jax.nn.relu(1.0 - jnp.abs(ddy))
        wx = jax.nn.relu(1.0 - jnp.abs(ddx))
        gwy = jnp.where(jnp.abs(ddy) < 1.0, -jnp.sign(ddy), 0.0)
        gwx = jnp.where(jnp.abs(ddx) < 1.0, -jnp.sign(ddx), 0.0)

        inner = jnp.einsum("bqpijd,bqd->bqpij", patches, gq)  # <patch_ij, g>
        a = attn_m[:, :, lid]  # [nm, lq, P]

        dattn_l.append(jnp.einsum("bqpij,bqpi,bqpj->bqp", inner, wy, wx))
        dy = a * jnp.einsum("bqpij,bqpi,bqpj->bqp", inner, gwy, wx) * h
        dx = a * jnp.einsum("bqpij,bqpi,bqpj->bqp", inner, wy, gwx) * w
        dloc_l.append(jnp.stack([dx, dy], -1))  # (x, y) order

        wgt = wy[..., :, None] * wx[..., None, :] * a[..., None, None]
        rows = (wgt[..., None] * gq[:, :, None, None, None, :]).reshape(
            n * m, lq * P * 4, d
        )
        idx = (
            (sy[..., None, None] + ii[:, None]) * w
            + (sx[..., None, None] + ii[None, :])
            + start
        ).reshape(n * m, lq * P * 4)
        dv = jax.vmap(lambda acc, i_, r_: acc.at[i_].add(r_))(dv, idx, rows)
        start += h * w

    dvalue = (
        dv.reshape(n, m, s, d).transpose(0, 2, 1, 3).astype(value.dtype)
    )
    dattn = (
        jnp.stack(dattn_l, 2)  # [nm, lq, L, P]
        .reshape(n, m, lq, L, P)
        .transpose(0, 2, 1, 3, 4)
        .astype(attention_weights.dtype)
    )
    dloc = (
        jnp.stack(dloc_l, 2)  # [nm, lq, L, P, 2]
        .reshape(n, m, lq, L, P, 2)
        .transpose(0, 2, 1, 3, 4, 5)
        .astype(sampling_locations.dtype)
    )
    return dvalue, dloc, dattn


_ms_deform_attn_core_vjp.defvjp(_core_vjp_fwd, _core_vjp_bwd)


def _window_gather(img: jax.Array, sy: jax.Array, sx: jax.Array) -> jax.Array:
    """Gather 2x2xD windows at integer starts. img [B, H, W, D]; sy/sx [B, ...].

    One gather index per sample point instead of four row gathers — XLA:TPU gather
    cost is dominated by index count, so patch slices are ~2.5x faster (measured).
    """
    b = img.shape[0]
    d = img.shape[-1]
    batch_shape = sy.shape
    starts = jnp.stack([sy, sx], -1).reshape(b, -1, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    patches = jax.lax.gather(
        img, starts, dimension_numbers=dnums, slice_sizes=(1, 2, 2, d),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )  # [B, Q, 2, 2, D]
    return patches.reshape(*batch_shape, 2, 2, d)


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
