"""Device-side LSA vs scipy, and full matching cost parity."""

import numpy as np
import pytest
import scipy.optimize

import jax
import jax.numpy as jnp

from multishiftseg_tpu.losses.matcher import (
    batch_dice_cost,
    batch_sigmoid_ce_cost,
    linear_sum_assignment,
    match,
)


@pytest.mark.parametrize("shape", [(5, 5), (8, 20), (19, 100), (1, 3)])
def test_lsa_matches_scipy_cost(rng, shape):
    for trial in range(5):
        cost = rng.randn(*shape).astype(np.float32) * 10
        ours = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
        rows, cols = scipy.optimize.linear_sum_assignment(cost)
        # assignments may differ under ties; total cost must match exactly
        assert len(set(ours.tolist())) == shape[0]  # distinct columns
        ours_cost = cost[np.arange(shape[0]), ours].sum()
        scipy_cost = cost[rows, cols].sum()
        assert ours_cost == pytest.approx(scipy_cost, abs=1e-3)


def test_lsa_with_duplicate_high_cost_rows(rng):
    """Padded (invalid) targets have identical big cost rows — must still assign."""
    cost = rng.randn(6, 10).astype(np.float32)
    cost[3:] = 1e9
    ours = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
    assert len(set(ours.tolist())) == 6
    rows, cols = scipy.optimize.linear_sum_assignment(cost.astype(np.float64))
    assert cost[np.arange(6), ours].sum() == pytest.approx(
        cost[rows, cols].sum(), rel=1e-6
    )


def test_cost_terms_match_torch_formulas(rng):
    import torch
    import torch.nn.functional as F

    q, t, p = 7, 4, 50
    inp = rng.randn(q, p).astype(np.float32)
    tgt = (rng.rand(t, p) > 0.5).astype(np.float32)

    ti, tt = torch.from_numpy(inp), torch.from_numpy(tgt)
    pos = F.binary_cross_entropy_with_logits(ti, torch.ones_like(ti), reduction="none")
    neg = F.binary_cross_entropy_with_logits(ti, torch.zeros_like(ti), reduction="none")
    ref_ce = (torch.einsum("nc,mc->nm", pos, tt) + torch.einsum("nc,mc->nm", neg, 1 - tt)) / p
    sig = ti.sigmoid()
    ref_dice = 1 - (2 * torch.einsum("nc,mc->nm", sig, tt) + 1) / (
        sig.sum(-1)[:, None] + tt.sum(-1)[None, :] + 1
    )

    np.testing.assert_allclose(
        np.asarray(batch_sigmoid_ce_cost(jnp.asarray(inp), jnp.asarray(tgt))),
        ref_ce.numpy(), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(batch_dice_cost(jnp.asarray(inp), jnp.asarray(tgt))),
        ref_dice.numpy(), rtol=1e-5, atol=1e-6,
    )


def test_batched_match_runs_under_jit(rng):
    b, q, t, p, k = 2, 16, 5, 32, 5
    pred_logits = jnp.asarray(rng.randn(b, q, k + 1).astype(np.float32))
    out_points = jnp.asarray(rng.randn(b, q, p).astype(np.float32))
    tgt_points = jnp.asarray((rng.rand(b, t, p) > 0.5).astype(np.float32))
    valid = jnp.asarray(np.array([[1, 1, 1, 0, 0], [1, 0, 1, 0, 1]], bool))
    out = jax.jit(match)(pred_logits, out_points, tgt_points, valid)
    out = np.asarray(out)
    assert out.shape == (b, t)
    for b_i in range(b):
        assert len(set(out[b_i].tolist())) == t  # distinct queries
