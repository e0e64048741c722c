"""RCL loss vs an independently-written torch oracle of the reference formula.

The contrastive terms pair randomly-sampled pixels, so exact equality is only defined
when scores are constant within each pixel population; the CE terms are deterministic
and checked exactly.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from multishiftseg_tpu.losses.rcl import RCLParams, rel_contrastive_loss


def torch_ce_terms(logits_nchw, targets, selection_ratio=None):
    """Oracle for the CE components (reference lib/loss.py:59-117 semantics)."""
    b = logits_nchw.shape[0]
    half = b // 2
    in_mask = targets < 99
    in_targets = targets.clone()
    in_targets[~in_mask] = 255
    nll = torch.nn.NLLLoss(reduction="none", ignore_index=255)
    ce_original = nll(
        F.log_softmax(logits_nchw[:half], dim=1), in_targets[:half]
    ).mean()
    ce_aug_map = nll(F.log_softmax(logits_nchw[half:], dim=1), in_targets[half:]).flatten()
    if selection_ratio is None:
        ce_aug = ce_aug_map.mean()
        if torch.isnan(ce_aug):
            ce_aug = torch.tensor(0.0)
    else:
        det = ce_aug_map.detach().clone()
        det[in_targets[half:].flatten() == 255] = float("inf")
        total = in_mask[half:].sum()
        select_num = int(selection_ratio * total)
        idx = torch.topk(det, select_num, largest=False)[1]
        ce_aug = ce_aug_map[idx].mean()
    return float(ce_original), float(ce_aug)


def _data(rng, half=2, h=9, w=11, c=5):
    logits = rng.randn(2 * half, h, w, c).astype(np.float32)
    targets = rng.randint(0, c, size=(2 * half, h, w)).astype(np.int32)
    # sprinkle OOD (254) and void (255)
    targets[rng.rand(*targets.shape) < 0.15] = 254
    targets[rng.rand(*targets.shape) < 0.1] = 255
    return logits, targets


@pytest.mark.parametrize("selection", [None, 0.8])
def test_ce_terms_match_reference(rng, selection):
    logits, targets = _data(rng)
    score = rng.randn(*targets.shape).astype(np.float32)
    params = RCLParams(
        ce_weights=(1.0, 1.0),
        inoutaug_contras_margins_tri=(0.0, 0.0, 0.0),
        contras_weight=0.0,
        conduct_pixel_selection=selection is not None,
        selection_ratio=selection or 1.0,
    )
    loss, aux = rel_contrastive_loss(
        jnp.asarray(logits), jnp.asarray(score), jnp.asarray(targets),
        jax.random.PRNGKey(0), params,
    )
    ce_o, ce_a = torch_ce_terms(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(targets).long(),
        selection,
    )
    assert float(aux["ce_original"]) == pytest.approx(ce_o, rel=1e-5)
    assert float(aux["ce_aug"]) == pytest.approx(ce_a, rel=1e-4)
    assert float(loss) == pytest.approx(ce_o + ce_a, rel=1e-4)


def test_contrastive_terms_constant_scores(rng):
    """With constant scores per population, any pairing yields the same loss."""
    logits, targets = _data(rng, half=2)
    half = 2
    score = np.zeros(targets.shape, np.float32)
    in_mask = targets < 99
    ood = (targets > 99) & (targets != 255)
    score[:half][in_mask[:half]] = -3.0  # clean in-dist
    score[half:][in_mask[half:]] = -2.0  # aug in-dist
    score[ood] = 1.0
    params = RCLParams(
        ce_weights=(0.0, 0.0),
        inoutaug_contras_margins_tri=(1.0, 2.0, 0.5),
        contras_weight=1.0,
    )
    loss, aux = rel_contrastive_loss(
        jnp.asarray(logits), jnp.asarray(score), jnp.asarray(targets),
        jax.random.PRNGKey(1), params,
    )
    # relu(-3 + 1 - 1) = 0 ; relu(-2 + 2 - 1) = 0 — wait compute directly:
    expect_orig = max(-3.0 + 1.0 - 1.0, 0.0)
    expect_aug = max(-2.0 + 2.0 - 1.0, 0.0)
    # contras_in over pixels in-dist in both views: relu(-2 - (-3) - 0.5) = 0.5
    both = in_mask[:half] & in_mask[half:]
    expect_in = 0.5 if both.any() else 0.0
    assert float(aux["contras_original"]) == pytest.approx(expect_orig, abs=1e-6)
    assert float(aux["contras_aug"]) == pytest.approx(expect_aug, abs=1e-6)
    assert float(aux["contras_in"]) == pytest.approx(expect_in, abs=1e-6)
    assert float(loss) == pytest.approx(expect_orig + expect_aug + expect_in, abs=1e-5)


def test_rcl_jits_and_grads(rng):
    logits, targets = _data(rng)
    score = rng.randn(*targets.shape).astype(np.float32)
    params = RCLParams(
        ce_weights=(50.0, 10.0),
        inoutaug_contras_margins_tri=(10.0, 5.0, 5.0),
        conduct_pixel_selection=True,
        selection_ratio=0.8,
    )

    @jax.jit
    def f(lg, sc):
        loss, _ = rel_contrastive_loss(
            lg, sc, jnp.asarray(targets), jax.random.PRNGKey(2), params
        )
        return loss

    g = jax.grad(lambda lg, sc: f(lg, sc), argnums=(0, 1))(
        jnp.asarray(logits), jnp.asarray(score)
    )
    assert np.isfinite(np.asarray(g[0])).all()
    assert np.isfinite(np.asarray(g[1])).all()
    assert np.abs(np.asarray(g[1])).sum() > 0  # score gradient flows


def test_bottom_k_sum_matches_sort():
    """_bottom_k_sum: exact k-smallest sum via bit-space binary search — value
    parity with np.sort over random values, threshold ties, and k edges."""
    import jax
    import jax.numpy as jnp

    from multishiftseg_tpu.losses.rcl import _bottom_k_sum

    r = np.random.RandomState(0)
    vals = np.abs(r.randn(4097)).astype(np.float32)
    vals[100:140] = vals[7]  # a 41-way tie crossing typical thresholds
    valid = r.rand(4097) > 0.2
    keyed = np.where(valid, vals, np.inf).astype(np.float32)
    masked_vals = np.where(valid, vals, 0.0).astype(np.float32)
    srt = np.sort(keyed[valid])

    f = jax.jit(_bottom_k_sum)
    for k in (0, 1, 7, int(0.8 * valid.sum()), int(valid.sum())):
        got = float(f(jnp.asarray(masked_vals), jnp.asarray(keyed),
                      jnp.int32(k)))
        want = float(srt[:k].sum())
        assert got == pytest.approx(want, rel=1e-5, abs=1e-5), (k, got, want)
