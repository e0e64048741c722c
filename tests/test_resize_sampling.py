"""Resize / grid-sample parity vs torch (CPU) reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from multishiftseg_tpu.ops.resize import resize_bilinear, resize_nearest
from multishiftseg_tpu.ops.sampling import grid_sample, point_sample


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((13, 17), (29, 31)),
        ((32, 32), (8, 8)),
        ((7, 9), (7, 9)),
        # exact integer factors: the phase-decomposed fast path (align=False)
        ((16, 32), (64, 128)),
        ((8, 8), (16, 48)),
        ((5, 6), (15, 6)),
    ],
)
def test_resize_bilinear_matches_torch(rng, align, in_hw, out_hw):
    x = rng.randn(2, *in_hw, 5).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=align))
    ref = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=out_hw,
            mode="bilinear",
            align_corners=align,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((13, 17), (29, 31)), ((32, 32), (8, 8))])
def test_resize_nearest_matches_torch(rng, in_hw, out_hw):
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    ref = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode="nearest")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref)


def test_grid_sample_matches_torch(rng):
    img = rng.randn(3, 11, 14, 4).astype(np.float32)
    # include out-of-bounds coordinates to exercise zero padding
    grid = (rng.rand(3, 50, 2).astype(np.float32) * 2.6 - 1.3)
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    ref = (
        F.grid_sample(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            torch.from_numpy(grid).unsqueeze(2),  # [N, P, 1, 2]
            mode="bilinear",
            padding_mode="zeros",
            align_corners=False,
        )
        .squeeze(-1)
        .permute(0, 2, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_point_sample_range01(rng):
    img = rng.randn(1, 8, 8, 2).astype(np.float32)
    pts = rng.rand(1, 20, 2).astype(np.float32)
    ours = np.asarray(point_sample(jnp.asarray(img), jnp.asarray(pts)))
    ref = (
        F.grid_sample(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            (2.0 * torch.from_numpy(pts) - 1.0).unsqueeze(2),
            mode="bilinear",
            padding_mode="zeros",
            align_corners=False,
        )
        .squeeze(-1)
        .permute(0, 2, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("in_hw,out_hw", [((13, 17), (29, 31)), ((16, 32), (64, 128))])
def test_resize_bilinear_nchw_matches_torch(rng, align, in_hw, out_hw):
    from multishiftseg_tpu.ops.resize import resize_bilinear_nchw

    x = rng.randn(2, 5, *in_hw).astype(np.float32)  # NCHW
    ours = np.asarray(resize_bilinear_nchw(jnp.asarray(x), out_hw, align_corners=align))
    ref = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=align
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
