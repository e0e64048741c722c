"""GMA attention-layer parity vs torch nn.MultiheadAttention oracles.

Covers the trickiest M2F conversion surfaces: packed in_proj splitting, boolean
attention masks (True = disallowed), and the all-masked-row guard the reference
applies before each cross attention (``mask2former_transformer_decoder.py:476-477``).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from multishiftseg_tpu.models.attention import MultiheadAttention

D, HEADS = 32, 4


def _torch_mha():
    torch.manual_seed(0)
    return torch.nn.MultiheadAttention(D, HEADS, batch_first=True)


def _convert(mha):
    w = mha.in_proj_weight.detach().numpy()
    b = mha.in_proj_bias.detach().numpy()
    params = {}
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        params[name] = {
            "kernel": w[i * D : (i + 1) * D].T,
            "bias": b[i * D : (i + 1) * D],
        }
    params["out_proj"] = {
        "kernel": mha.out_proj.weight.detach().numpy().T,
        "bias": mha.out_proj.bias.detach().numpy(),
    }
    return {"params": params}


def test_unmasked_matches_torch(rng):
    mha = _torch_mha()
    q = rng.randn(2, 7, D).astype(np.float32)
    k = rng.randn(2, 11, D).astype(np.float32)
    v = rng.randn(2, 11, D).astype(np.float32)
    with torch.no_grad():
        ref, _ = mha(torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v))
    ours = MultiheadAttention(D, HEADS).apply(
        _convert(mha), jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_bool_mask_matches_torch(rng):
    mha = _torch_mha()
    q = rng.randn(1, 5, D).astype(np.float32)
    kv = rng.randn(1, 9, D).astype(np.float32)
    # per-head bool mask [N*H, Lq, Lk], True = not allowed; keep >=1 allowed per row
    mask = rng.rand(1 * HEADS, 5, 9) < 0.4
    mask[..., 0] = False
    with torch.no_grad():
        ref, _ = mha(
            torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv),
            attn_mask=torch.from_numpy(mask),
        )
    ours = MultiheadAttention(D, HEADS).apply(
        _convert(mha), jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv),
        jnp.asarray(mask.reshape(1, HEADS, 5, 9)),
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_all_masked_row_guard(rng):
    """Rows with no allowed keys fall back to unmasked attention (the reference
    zeroes such rows' masks before the call; torch would emit NaN)."""
    mha = _torch_mha()
    q = rng.randn(1, 3, D).astype(np.float32)
    kv = rng.randn(1, 6, D).astype(np.float32)
    mask = np.zeros((1 * HEADS, 3, 6), bool)
    mask[:, 1, :] = True  # query 1: everything masked
    # oracle: reference resets all-True rows to False
    mask_ref = mask.copy()
    mask_ref[mask_ref.all(-1)] = False
    with torch.no_grad():
        ref, _ = mha(
            torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv),
            attn_mask=torch.from_numpy(mask_ref),
        )
    ours = MultiheadAttention(D, HEADS).apply(
        _convert(mha), jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv),
        jnp.asarray(mask.reshape(1, HEADS, 3, 6)),
    )
    assert np.isfinite(np.asarray(ours)).all()
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)
