"""Bilinear / nearest resize as separable interpolation matmuls.

The reference leans on ``torch.nn.functional.interpolate`` everywhere:
``align_corners=True`` for the DeepLab upsample wrapper (``lib/network/deepv3/mynn.py:33``)
and ``align_corners=False`` for all Mask2Former mask upsampling
(``maskformer_model.py:264-277``, ``mask2former_transformer_decoder.py:533``).

On TPU, a bilinear resize is expressed here as two dense matmuls with (out, in)
interpolation matrices — separable, exact, and lands on the MXU instead of the
gather/scatter units. The matrices are built host-side with numpy (shapes are static
under jit) and closed over as constants.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense (out_size, in_size) bilinear interpolation matrix.

    Matches torch ``F.interpolate(mode='bilinear')`` source-coordinate conventions:
    align_corners=True  -> src = i * (in-1)/(out-1)
    align_corners=False -> src = (i + 0.5) * in/out - 0.5, edge-clamped.
    """
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = i * (in_size - 1) / max(out_size - 1, 1)
    else:
        src = (i + 0.5) * in_size / out_size - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = src - lo
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, lo), 1.0 - w_hi)
    np.add.at(mat, (rows, hi), w_hi)
    return mat.astype(np.float32)


@functools.lru_cache(maxsize=256)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    """Source index per output pixel, matching torch ``mode='nearest'``
    (floor(i * in/out))."""
    i = np.arange(out_size, dtype=np.float64)
    return np.minimum(np.floor(i * in_size / out_size), in_size - 1).astype(np.int32)


def _upsample_axis_int(x: jax.Array, s: int, axis: int) -> jax.Array:
    """Exact integer-factor bilinear upsample along one axis (align_corners=False).

    For scale s, output i = s*i0 + p has source coordinate i0 + (2p+1-s)/(2s): each
    of the s phases is a fixed 2-tap combination of x and an edge-clamped shifted
    copy, interleaved by a stack+reshape. Pure fused elementwise VPU work — replaces
    the dense [out, in] interpolation matmul, whose TPU conv-emitter lowering cost
    7.5 ms for the [100, 256->1024, 512->2048] mask upsample (device trace) vs
    ~1.5 ms for this form. Exactly matches torch F.interpolate edge clamping: at the
    borders both bilinear corners clamp to the same pixel, so the (frac, 1-frac)
    weighting degenerates to the identity the clamped-coordinate formula produces.
    """
    if s == 1:
        return x
    axis = axis % x.ndim
    xm = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 0, 1, axis=axis),
         jax.lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)], axis=axis)
    xp = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, None, axis=axis),
         jax.lax.slice_in_dim(x, x.shape[axis] - 1, None, axis=axis)], axis=axis)
    phases = []
    for p in range(s):
        frac = (2 * p + 1 - s) / (2 * s)
        if frac < 0:
            ph = jnp.asarray(-frac, x.dtype) * xm + jnp.asarray(1 + frac, x.dtype) * x
        elif frac == 0:
            ph = x
        else:
            ph = jnp.asarray(1 - frac, x.dtype) * x + jnp.asarray(frac, x.dtype) * xp
        phases.append(ph)
    y = jnp.stack(phases, axis=axis + 1)  # [..., H, s, ...]
    return y.reshape(x.shape[: axis] + (x.shape[axis] * s,) + x.shape[axis + 1 :])


def resize_bilinear(
    x: jax.Array, size: Tuple[int, int], align_corners: bool = False
) -> jax.Array:
    """Bilinear-resize the two trailing spatial axes of an NHWC array.

    Args:
      x: [..., H, W, C].
      size: (H_out, W_out).
      align_corners: torch semantics flag.
    """
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x
    # NOTE: a phase-decomposed integer-factor fast path (_upsample_axis_int) was
    # measured SLOWER end-to-end on v5e (6.36 vs 6.69 img/s M2F eval): the
    # stack+reshape phase interleave relayouts along the lane dim cost more than
    # the interpolation-matrix matmuls it replaced. Kept (tested) for callers with
    # channel-minor layouts where the matmul form degenerates.
    mh = jnp.asarray(_interp_matrix(h_in, h_out, align_corners))
    mw = jnp.asarray(_interp_matrix(w_in, w_out, align_corners))
    dtype = x.dtype
    # fp32 inputs (logit/score paths, parity tests) use full-precision interpolation;
    # bf16 feature maps keep the fast MXU path — their values are already bf16-rounded
    # and pow-of-2 scale factors have exactly representable weights.
    if dtype == jnp.bfloat16:
        hp = jax.lax.Precision.DEFAULT
        xf = x
        mh = mh.astype(jnp.bfloat16)
        mw = mw.astype(jnp.bfloat16)
    else:
        hp = jax.lax.Precision.HIGHEST
        xf = x.astype(jnp.float32)
    # [..., H_in, W_in, C] -> [..., H_out, W_in, C]
    xf = jnp.einsum("oh,...hwc->...owc", mh, xf, precision=hp)
    # -> [..., H_out, W_out, C]
    xf = jnp.einsum("pw,...hwc->...hpc", mw, xf, precision=hp)
    return xf.astype(dtype)


def resize_bilinear_nchw(
    x: jax.Array, size: Tuple[int, int], align_corners: bool = False
) -> jax.Array:
    """Bilinear resize of a channels-FIRST array's trailing [H, W] axes.

    Same semantics as :func:`resize_bilinear` but avoids the NCHW->NHWC->NCHW
    round trip for callers whose data is already [..., H, W] (the Mask2Former
    mask heads): with W minor, both interpolation einsums lower to canonical MXU
    matmuls instead of the slow conv-emitter form ([100, 256->1024, 512->2048]
    measured 10.1 ms via the NHWC path + transposes vs ~3 ms here, v5e trace).
    """
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x
    mh = jnp.asarray(_interp_matrix(h_in, h_out, align_corners))
    mw = jnp.asarray(_interp_matrix(w_in, w_out, align_corners))
    dtype = x.dtype
    if dtype == jnp.bfloat16:
        hp = jax.lax.Precision.DEFAULT
        xf = x
        mh = mh.astype(jnp.bfloat16)
        mw = mw.astype(jnp.bfloat16)
    else:
        hp = jax.lax.Precision.HIGHEST
        xf = x.astype(jnp.float32)
    xf = jnp.einsum("oh,...hw->...ow", mh, xf, precision=hp)
    xf = jnp.einsum("pw,...hw->...hp", mw, xf, precision=hp)
    return xf.astype(dtype)


def resize_nearest(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Nearest-neighbour resize of the two trailing spatial axes of [..., H, W, C]."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x
    ih = jnp.asarray(_nearest_index(h_in, h_out))
    iw = jnp.asarray(_nearest_index(w_in, w_out))
    x = jnp.take(x, ih, axis=-3)
    x = jnp.take(x, iw, axis=-2)
    return x
