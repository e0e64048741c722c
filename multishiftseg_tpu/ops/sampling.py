"""Bilinear grid sampling (the TPU equivalent of ``F.grid_sample``).

Used by (a) the pure-XLA multi-scale deformable-attention reference path (the reference's
``ms_deform_attn_core_pytorch``, ``ops/functions/ms_deform_attn_func.py:52-72``) and
(b) point-sampled mask losses (detectron2 ``point_sample``; consumed by
``modeling/criterion.py`` and ``modeling/matcher.py``).

Semantics match torch ``grid_sample(mode='bilinear', padding_mode='zeros',
align_corners=False)``: out-of-bounds corners contribute zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample_pixel(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Sample ``img`` at continuous pixel coordinates with zero padding.

    Args:
      img: [N, H, W, C].
      x, y: [N, P] pixel-space coordinates (x along W, y along H). May be OOB.
    Returns:
      [N, P, C] sampled values.
    """
    n, h, w, c = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = img.reshape(n, h * w, c)

    def corner(ix, iy):
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
        # row-gather formulation: XLA:TPU runs [1, C]-slice gathers at HBM bandwidth
        v = jax.vmap(lambda vb, ib: vb[ib])(flat, idx)
        return v * valid[..., None].astype(v.dtype)

    v00 = corner(x0i, y0i)
    v01 = corner(x0i + 1, y0i)
    v10 = corner(x0i, y0i + 1)
    v11 = corner(x0i + 1, y0i + 1)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def grid_sample(img: jax.Array, grid: jax.Array) -> jax.Array:
    """torch-style grid_sample, bilinear / zeros / align_corners=False.

    Args:
      img: [N, H, W, C].
      grid: [N, P, 2] normalized coords in [-1, 1], (x, y) order.
    Returns:
      [N, P, C].
    """
    h, w = img.shape[1], img.shape[2]
    # align_corners=False unnormalization: ix = ((gx + 1) * W - 1) / 2
    x = ((grid[..., 0] + 1.0) * w - 1.0) * 0.5
    y = ((grid[..., 1] + 1.0) * h - 1.0) * 0.5
    return bilinear_sample_pixel(img, x, y)


def point_sample(img: jax.Array, point_coords: jax.Array) -> jax.Array:
    """detectron2 ``point_sample`` equivalent on NHWC tensors.

    Args:
      img: [N, H, W, C].
      point_coords: [N, P, 2] in [0, 1], (x, y) order.
    Returns:
      [N, P, C].
    """
    return grid_sample(img, 2.0 * point_coords - 1.0)
