"""MSDeformAttn parity vs a torch grid_sample oracle (the dual-implementation pattern
of the reference kernel test, ``ops/test.py``), plus gradient checks."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from multishiftseg_tpu.ops.ms_deform_attn import ms_deform_attn_core

SHAPES = [(6, 4), (3, 2)]
N, M, D, LQ, P = 2, 4, 8, 7, 3


def torch_oracle(value, shapes, loc, attn):
    """Independent torch implementation: per-level grid_sample, weighted sum."""
    n, s, m, d = value.shape
    _, lq, _, L, p, _ = loc.shape
    splits = [h * w for h, w in shapes]
    value_list = value.split(splits, dim=1)
    grids = 2 * loc - 1
    sampled = []
    for lid, (h, w) in enumerate(shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(n * m, d, h, w)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)  # [N*M, Lq, P, 2]
        sv = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        sampled.append(sv)  # [N*M, D, Lq, P]
    attn_t = attn.transpose(1, 2).reshape(n * m, 1, lq, L * p)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * attn_t).sum(-1).view(n, m * d, lq)
    return out.transpose(1, 2).contiguous()


def _inputs(rng):
    s = sum(h * w for h, w in SHAPES)
    value = rng.randn(N, s, M, D).astype(np.float32)
    loc = rng.rand(N, LQ, M, len(SHAPES), P, 2).astype(np.float32) * 1.2 - 0.1
    attn = rng.rand(N, LQ, M, len(SHAPES), P).astype(np.float32)
    attn /= attn.reshape(N, LQ, M, -1).sum(-1).reshape(N, LQ, M, 1, 1)
    return value, loc, attn


def test_forward_matches_oracle(rng):
    value, loc, attn = _inputs(rng)
    ours = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn))
    )
    ref = torch_oracle(
        torch.from_numpy(value), SHAPES, torch.from_numpy(loc), torch.from_numpy(attn)
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("d", [8, 16, 32])
def test_forward_channel_sizes(rng, d):
    s = sum(h * w for h, w in SHAPES)
    value = rng.randn(N, s, M, d).astype(np.float32)
    _, loc, attn = _inputs(rng)
    ours = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn))
    )
    ref = torch_oracle(
        torch.from_numpy(value), SHAPES, torch.from_numpy(loc), torch.from_numpy(attn)
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_gradients_match_torch_autograd(rng):
    """VJP of the XLA op vs torch autograd through the oracle."""
    value, loc, attn = _inputs(rng)
    g = rng.randn(N, LQ, M * D).astype(np.float32)

    def f(v, l, a):
        return jnp.vdot(
            ms_deform_attn_core(v, SHAPES, l, a), jnp.asarray(g)
        )

    gv, gl, ga = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn)
    )

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    ta = torch.from_numpy(attn).requires_grad_(True)
    out = torch_oracle(tv, SHAPES, tl, ta)
    (out * torch.from_numpy(g)).sum().backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-4, atol=1e-5)
    # Location grads differ at exact grid points (floor discontinuity); compare loosely.
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_int8_table_accuracy_gate(rng):
    """The int8 value-table fast path must stay within ~bf16-level error of the
    fp32 oracle (the VERDICT accuracy gate for the eval fast path): per-channel
    symmetric quantization of well-scaled activations carries ~log2(127) ~ 7 bits
    of mantissa vs bf16's 8."""
    value, loc, attn = _inputs(rng)
    ref = torch_oracle(
        torch.from_numpy(value), SHAPES, torch.from_numpy(loc), torch.from_numpy(attn)
    ).numpy()
    scale = np.abs(ref).max()

    ours_i8 = np.asarray(
        ms_deform_attn_core(
            jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn),
            quantize_table=True,
        )
    )
    err_i8 = np.abs(ours_i8 - ref).max() / scale

    ours_bf16 = np.asarray(
        ms_deform_attn_core(
            jnp.asarray(value, jnp.bfloat16), SHAPES, jnp.asarray(loc),
            jnp.asarray(attn, jnp.bfloat16),
        )
    ).astype(np.float32)
    err_bf16 = np.abs(ours_bf16 - ref).max() / scale

    # int8-with-per-channel-scale must be within 3x of the bf16 path's error and
    # within 2% absolute-relative of the fp32 oracle
    assert err_i8 < 0.02, err_i8
    assert err_i8 < 3.0 * max(err_bf16, 1e-4), (err_i8, err_bf16)


def test_int8_table_gradients_flow(rng):
    """Grads of the quantized forward use the exact values (straight-through on
    the table): finite and close to the exact-path grads."""
    value, loc, attn = _inputs(rng)

    def f(v, l, a, q):
        return jnp.sum(ms_deform_attn_core(v, SHAPES, l, a, quantize_table=q) ** 2)

    g_q = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn), True
    )
    g_e = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn), False
    )
    for gq, ge in zip(g_q, g_e):
        assert np.isfinite(np.asarray(gq)).all()
        denom = np.abs(np.asarray(ge)).max() + 1e-6
        assert np.abs(np.asarray(gq) - np.asarray(ge)).max() / denom < 0.05


def test_debug_bounds_gate(rng, monkeypatch):
    """MSS_DEBUG_BOUNDS=1 verifies the PROMISE_IN_BOUNDS invariant at runtime:
    clean inputs pass (fwd + bwd), a corrupted index raises."""
    from multishiftseg_tpu.ops.ms_deform_attn import _flat_row_gather

    monkeypatch.setenv("MSS_DEBUG_BOUNDS", "1")
    value, loc, attn = _inputs(rng)

    def f(v, l, a):
        return jnp.sum(ms_deform_attn_core(v, SHAPES, l, a) ** 2)

    g = jax.grad(f)(jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))
    jax.block_until_ready(g)  # fwd+bwd sites checked, no raise

    tab = jnp.zeros((10, 8), jnp.float32)
    with pytest.raises(Exception, match="out-of-bounds"):
        jax.block_until_ready(_flat_row_gather(tab, jnp.asarray([0, 3, 10])))


@pytest.mark.slow
def test_bf16_scatter_grad_gate(rng, monkeypatch):
    """MSS_BF16_SCATTER=1 value-grad accumulation stays within bf16-level error
    of the exact f32 scatter (the accuracy gate for the training fast path)."""
    value, loc, attn = _inputs(rng)

    def g(v, l, a):
        return jax.grad(
            lambda v_: jnp.sum(ms_deform_attn_core(v_, SHAPES, l, a) ** 2)
        )(v)

    monkeypatch.delenv("MSS_BF16_SCATTER", raising=False)
    exact = np.asarray(g(jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn)))
    monkeypatch.setenv("MSS_BF16_SCATTER", "1")
    jax.clear_caches()  # env is read at trace time
    fast = np.asarray(g(jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn)))
    jax.clear_caches()
    rel = np.abs(fast - exact).max() / (np.abs(exact).max() + 1e-9)
    assert rel < 0.02, rel


def test_nearest_mode_matches_torch_nearest_oracle(rng):
    """The approximate eval path is itself exact w.r.t. a nearest-neighbor
    grid_sample oracle (it is approximate only vs the bilinear op)."""
    value, loc, attn = _inputs(rng)
    ours = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), SHAPES, jnp.asarray(loc),
                            jnp.asarray(attn), sample_mode="nearest")
    )
    # torch oracle with nearest sampling
    n, s, m, d = value.shape
    tv, tl, ta = torch.from_numpy(value), torch.from_numpy(loc), torch.from_numpy(attn)
    splits = [h * w for h, w in SHAPES]
    value_list = tv.split(splits, dim=1)
    grids = 2 * tl - 1
    sampled = []
    for lid, (h, w) in enumerate(SHAPES):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(n * m, d, h, w)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        sampled.append(F.grid_sample(v, g, mode="nearest", padding_mode="zeros",
                                     align_corners=False))
    attn_t = ta.transpose(1, 2).reshape(n * m, 1, LQ, len(SHAPES) * P)
    ref = (torch.stack(sampled, dim=-2).flatten(-2) * attn_t).sum(-1).view(n, m * d, LQ)
    ref = ref.transpose(1, 2).contiguous().numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_nearest_mode_exact_at_pixel_centers(rng):
    """At pixel centers bilinear degenerates to point sampling, so the
    approximate mode must equal the exact op bit-for-bit there."""
    s = sum(h * w for h, w in SHAPES)
    value = rng.randn(N, s, M, D).astype(np.float32)
    _, _, attn = _inputs(rng)
    loc = np.empty((N, LQ, M, len(SHAPES), P, 2), np.float32)
    for lid, (h, w) in enumerate(SHAPES):
        jj = rng.randint(0, w, (N, LQ, M, P))
        ii = rng.randint(0, h, (N, LQ, M, P))
        loc[:, :, :, lid, :, 0] = (jj + 0.5) / w
        loc[:, :, :, lid, :, 1] = (ii + 0.5) / h
    exact = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn)))
    approx = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn),
        sample_mode="nearest"))
    np.testing.assert_allclose(approx, exact, rtol=1e-5, atol=1e-6)


def test_nearest_mode_deviation_gate(rng):
    """Bound the approximation error vs the exact bilinear op.

    The error of nearest-vs-bilinear sampling is a half-pixel grid rounding —
    it scales with the spatial ROUGHNESS of the feature map, not with numeric
    precision (on iid-random maps it is O(feature scale) by construction;
    measured 0.67 relative). Real encoder activations are spatially smooth, so
    the gate runs on band-limited features (wavelength ~16 px, where the
    analytic bound is sin-slope * 0.5 px ~ 0.2 of amplitude). The accuracy
    impact on released checkpoints is unverifiable offline; this gate + PERF.md
    document the trade and the mode stays an opt-in."""
    h, w = 32, 32
    shapes = [(h, w)]
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    freqs = rng.rand(N, M, D, 2) * (2 * np.pi / 16.0)
    phase = rng.rand(N, M, D, 2) * (2 * np.pi)
    value = np.sin(
        freqs[..., 0, None, None] * yy + freqs[..., 1, None, None] * xx
        + phase[..., 0, None, None]
    ).transpose(0, 3, 4, 1, 2).reshape(N, h * w, M, D).astype(np.float32)
    loc = rng.rand(N, LQ, M, 1, P, 2).astype(np.float32)
    attn = rng.rand(N, LQ, M, 1, P).astype(np.float32)
    attn /= attn.sum(-1, keepdims=True)
    exact = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)))
    approx = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
        sample_mode="nearest"))
    scale = np.abs(exact).max()
    dev = np.abs(approx - exact).max() / scale
    assert np.isfinite(approx).all()
    assert dev < 0.25, dev


def test_degenerate_level_h1_matches_oracle(rng):
    """A level collapsed to height/width 1 (any 32-px input dim at stride 32):
    the window-start clamp must saturate at 0 (h-2 = -1 would address the
    previous level's table rows) and the im2col zero padding must reproduce
    grid_sample's zero padding — fwd AND grads vs the torch oracle."""
    shapes = [(4, 4), (1, 2)]  # second level: h == 1
    s = sum(h * w for h, w in shapes)
    value = rng.randn(N, s, M, D).astype(np.float32)
    loc = rng.rand(N, LQ, M, len(shapes), P, 2).astype(np.float32) * 1.2 - 0.1
    attn = rng.rand(N, LQ, M, len(shapes), P).astype(np.float32)
    attn /= attn.reshape(N, LQ, M, -1).sum(-1).reshape(N, LQ, M, 1, 1)

    ours = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)))
    ref = torch_oracle(torch.from_numpy(value), shapes,
                       torch.from_numpy(loc), torch.from_numpy(attn)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    g = rng.randn(N, LQ, M * D).astype(np.float32)

    def f(v, a):
        return jnp.vdot(ms_deform_attn_core(v, shapes, jnp.asarray(loc), a),
                        jnp.asarray(g))

    gv, ga = jax.grad(f, argnums=(0, 1))(jnp.asarray(value), jnp.asarray(attn))
    tv = torch.from_numpy(value).requires_grad_(True)
    ta = torch.from_numpy(attn).requires_grad_(True)
    out = torch_oracle(tv, shapes, torch.from_numpy(loc), ta)
    (out * torch.from_numpy(g)).sum().backward()
    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-4, atol=1e-5)


def _shared_numpy_oracle(value, shapes, loc, attn):
    """Independent numpy implementation of the shared-corner definition:
    per (l, p), nearest-pixel sample at the attention-mass-weighted centroid
    of the head locations, weighted by the exact per-head attention."""
    n, s, m, d = value.shape
    _, lq, _, L, p, _ = loc.shape
    out = np.zeros((n, lq, m, d), np.float32)
    offs = np.concatenate([[0], np.cumsum([h * w for h, w in shapes])[:-1]])
    for b in range(n):
        for q in range(lq):
            for lid, (h, w) in enumerate(shapes):
                for pt in range(p):
                    a = attn[b, q, :, lid, pt]  # [M]
                    asum = max(a.sum(), 1e-12)
                    cx = (a * loc[b, q, :, lid, pt, 0]).sum() / asum
                    cy = (a * loc[b, q, :, lid, pt, 1]).sum() / asum
                    x = cx * w - 0.5
                    y = cy * h - 0.5
                    if not (-0.5 < x < w - 0.5 and -0.5 < y < h - 0.5):
                        continue
                    ix = int(np.clip(np.floor(x + 0.5), 0, w - 1))
                    iy = int(np.clip(np.floor(y + 0.5), 0, h - 1))
                    row = value[b, offs[lid] + iy * w + ix]  # [M, D]
                    out[b, q] += a[:, None] * row
    return out.reshape(n, lq, m * d)


def test_shared_mode_matches_numpy_oracle(rng):
    """The shared-corner mode (one gather per (l, p), head-shared centroid
    location) equals an independent numpy implementation of its definition,
    including out-of-bounds drops (the _inputs range spills past [0, 1])."""
    value, loc, attn = _inputs(rng)
    ours = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn),
        sample_mode="shared"))
    ref = _shared_numpy_oracle(value, SHAPES, loc, attn)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_shared_mode_equals_nearest_when_heads_agree(rng):
    """When every head samples the same location per (l, p), the centroid IS
    that location, so shared mode must equal nearest mode exactly — this pins
    the [N*S, M*D] row-gather channel indexing per head."""
    value, loc, attn = _inputs(rng)
    loc = np.broadcast_to(loc[:, :, :1], loc.shape).copy()
    shared = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn),
        sample_mode="shared"))
    nearest = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn),
        sample_mode="nearest"))
    np.testing.assert_allclose(shared, nearest, rtol=1e-5, atol=1e-6)


def test_shared_mode_exact_at_headshared_pixel_centers(rng):
    """Heads agreeing at pixel centers: bilinear degenerates to point
    sampling and the centroid is the point, so shared == the exact op."""
    s = sum(h * w for h, w in SHAPES)
    value = rng.randn(N, s, M, D).astype(np.float32)
    _, _, attn = _inputs(rng)
    loc = np.empty((N, LQ, M, len(SHAPES), P, 2), np.float32)
    for lid, (h, w) in enumerate(SHAPES):
        jj = rng.randint(0, w, (N, LQ, 1, P))
        ii = rng.randint(0, h, (N, LQ, 1, P))
        loc[:, :, :, lid, :, 0] = (jj + 0.5) / w
        loc[:, :, :, lid, :, 1] = (ii + 0.5) / h
    exact = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn)))
    shared = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn),
        sample_mode="shared"))
    np.testing.assert_allclose(shared, exact, rtol=1e-5, atol=1e-6)


def _nearest_topk_numpy_oracle(value, shapes, loc, attn, top):
    """Independent numpy implementation of nearest_top{T}: per head, zero OOB
    weights, keep the T largest, renormalize to the full in-bounds mass,
    nearest-sample each kept point."""
    n, s, m, d = value.shape
    _, lq, _, L, p, _ = loc.shape
    offs = np.concatenate([[0], np.cumsum([h * w for h, w in shapes])[:-1]])
    out = np.zeros((n, lq, m, d), np.float32)
    for b in range(n):
        for q in range(lq):
            for mm in range(m):
                w_all, rows = [], []
                for lid, (h, w) in enumerate(shapes):
                    for pt in range(p):
                        x = loc[b, q, mm, lid, pt, 0] * w - 0.5
                        y = loc[b, q, mm, lid, pt, 1] * h - 0.5
                        if -0.5 < x < w - 0.5 and -0.5 < y < h - 0.5:
                            ix = int(np.clip(np.floor(x + 0.5), 0, w - 1))
                            iy = int(np.clip(np.floor(y + 0.5), 0, h - 1))
                            w_all.append(attn[b, q, mm, lid, pt])
                            rows.append(value[b, offs[lid] + iy * w + ix, mm])
                        else:
                            w_all.append(0.0)
                            rows.append(np.zeros(d, np.float32))
                w_all = np.asarray(w_all, np.float32)
                keep = np.argsort(-w_all, kind="stable")[:top]
                kept = w_all[keep]
                denom = max(kept.sum(), 1e-12)
                kept = kept * (w_all.sum() / denom)
                for k, j in enumerate(keep):
                    out[b, q, mm] += kept[k] * rows[j]
    return out.reshape(n, lq, m * d)


def test_nearest_topk_matches_numpy_oracle(rng):
    value, loc, attn = _inputs(rng)
    for top in (2, 4):
        ours = np.asarray(ms_deform_attn_core(
            jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn),
            sample_mode=f"nearest_top{top}"))
        ref = _nearest_topk_numpy_oracle(value, SHAPES, loc, attn, top)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_nearest_topk_full_equals_nearest(rng):
    """top = L*P keeps every point (renormalization factor 1): must equal
    plain nearest mode."""
    value, loc, attn = _inputs(rng)
    J = len(SHAPES) * P
    full = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn),
        sample_mode=f"nearest_top{J}"))
    nearest = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn),
        sample_mode="nearest"))
    np.testing.assert_allclose(full, nearest, rtol=1e-5, atol=1e-6)


def test_nearest_topk_exact_when_mass_concentrated(rng):
    """If each head's weight is concentrated on <= T points, nearest_top{T}
    must equal plain nearest exactly (nothing is dropped)."""
    value, loc, _ = _inputs(rng)
    J = len(SHAPES) * P
    top = 3
    attn = np.zeros((N, LQ, M, J), np.float32)
    for b in range(N):
        for q in range(LQ):
            for mm in range(M):
                idx = rng.choice(J, top, replace=False)
                w_ = rng.rand(top).astype(np.float32)
                attn[b, q, mm, idx] = w_ / w_.sum()
    attn = attn.reshape(N, LQ, M, len(SHAPES), P)
    ours = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn),
        sample_mode=f"nearest_top{top}"))
    nearest = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn),
        sample_mode="nearest"))
    np.testing.assert_allclose(ours, nearest, rtol=1e-4, atol=1e-5)


def _nearest_topkc_numpy_oracle(value, shapes, loc, attn, top):
    """Independent numpy implementation of nearest_top{T}c: kept top-T points
    keep their EXACT weights; each (head, level)'s dropped tail is one
    nearest-sampled row at its weighted centroid carrying the tail mass."""
    n, s, m, d = value.shape
    _, lq, _, L, p, _ = loc.shape
    offs = np.concatenate([[0], np.cumsum([h * w for h, w in shapes])[:-1]])
    out = np.zeros((n, lq, m, d), np.float32)
    for b in range(n):
        for q in range(lq):
            for mm in range(m):
                w_all = np.zeros(L * p, np.float32)
                rows = np.zeros((L * p, d), np.float32)
                for lid, (h, w) in enumerate(shapes):
                    for pt in range(p):
                        j = lid * p + pt
                        x = loc[b, q, mm, lid, pt, 0] * w - 0.5
                        y = loc[b, q, mm, lid, pt, 1] * h - 0.5
                        if -0.5 < x < w - 0.5 and -0.5 < y < h - 0.5:
                            ix = int(np.clip(np.floor(x + 0.5), 0, w - 1))
                            iy = int(np.clip(np.floor(y + 0.5), 0, h - 1))
                            w_all[j] = attn[b, q, mm, lid, pt]
                            rows[j] = value[b, offs[lid] + iy * w + ix, mm]
                keep = np.argsort(-w_all, kind="stable")[:top]
                for j in keep:
                    out[b, q, mm] += w_all[j] * rows[j]
                tail = np.setdiff1d(np.arange(L * p), keep)
                for lid, (h, w) in enumerate(shapes):
                    jj = [j for j in tail if j // p == lid]
                    mass = float(w_all[jj].sum())
                    if mass <= 1e-12:
                        continue
                    cx = float((w_all[jj] * loc[b, q, mm, lid,
                                                [j % p for j in jj], 0]).sum()) / mass
                    cy = float((w_all[jj] * loc[b, q, mm, lid,
                                                [j % p for j in jj], 1]).sum()) / mass
                    x = cx * w - 0.5
                    y = cy * h - 0.5
                    if -0.5 < x < w - 0.5 and -0.5 < y < h - 0.5:
                        ix = int(np.clip(np.floor(x + 0.5), 0, w - 1))
                        iy = int(np.clip(np.floor(y + 0.5), 0, h - 1))
                        out[b, q, mm] += mass * value[b, offs[lid] + iy * w + ix, mm]
    return out.reshape(n, lq, m * d)


def test_nearest_topkc_matches_numpy_oracle(rng):
    value, loc, attn = _inputs(rng)
    for top in (2, 4):
        ours = np.asarray(ms_deform_attn_core(
            jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn),
            sample_mode=f"nearest_top{top}c"))
        ref = _nearest_topkc_numpy_oracle(value, SHAPES, loc, attn, top)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_nearest_topkc_exact_when_mass_concentrated(rng):
    """Zero tail mass (weight on <= T points) -> identical to plain nearest:
    the centroid correction contributes nothing and the kept weights are
    untouched (no renormalization in this variant)."""
    value, loc, _ = _inputs(rng)
    J = len(SHAPES) * P
    top = 3
    attn = np.zeros((N, LQ, M, J), np.float32)
    for b in range(N):
        for q in range(LQ):
            for mm in range(M):
                idx = rng.choice(J, top, replace=False)
                w_ = rng.rand(top).astype(np.float32)
                attn[b, q, mm, idx] = w_ / w_.sum()
    attn = attn.reshape(N, LQ, M, len(SHAPES), P)
    ours = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn),
        sample_mode=f"nearest_top{top}c"))
    nearest = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn),
        sample_mode="nearest"))
    np.testing.assert_allclose(ours, nearest, rtol=1e-4, atol=1e-5)


def test_nearest_topkc_beats_plain_topk_on_smooth_maps(rng):
    """On smooth value maps (where a tail centroid is a good surrogate for
    its points) the centroid-corrected pruning must approximate plain
    nearest better than renormalized pruning — the property that motivates
    the mode (plain top-K relocates the dropped mass; outputs/r5 measured
    that outside the accuracy budget)."""
    s = sum(h * w for h, w in SHAPES)
    # smooth per-level linear ramps instead of white noise
    cols = []
    for (h, w) in SHAPES:
        gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
        base = (gy / max(h - 1, 1) + gx / max(w - 1, 1))[..., None, None]
        cols.append(np.broadcast_to(
            base, (h, w, M, D)).reshape(h * w, M, D))
    value = np.broadcast_to(np.concatenate(cols, 0), (N, s, M, D)).astype(np.float32)
    value = value + rng.randn(*value.shape).astype(np.float32) * 0.01
    _, loc, attn = _inputs(rng)
    top = 4
    nearest = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn),
        sample_mode="nearest"))
    plain = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn),
        sample_mode=f"nearest_top{top}"))
    corrected = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn),
        sample_mode=f"nearest_top{top}c"))
    err_plain = np.abs(plain - nearest).mean()
    err_corr = np.abs(corrected - nearest).mean()
    assert err_corr < err_plain, (err_corr, err_plain)


def test_per_layer_hybrid_sample_mode():
    """MSDeformAttnPixelDecoder accepts a per-layer mode tuple; all-same
    tuple equals the single-mode path exactly, and a wrong-length tuple is
    rejected."""
    import pytest as _pytest

    from multishiftseg_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder

    feats = {
        name: jnp.asarray(np.random.RandomState(i).randn(1, hw, hw, 8),
                          np.float32)
        for i, (name, hw) in enumerate(
            [("res2", 16), ("res3", 8), ("res4", 4), ("res5", 2)])
    }
    kw = dict(conv_dim=32, mask_dim=32, transformer_enc_layers=2, n_heads=2,
              n_points=2)
    dec_single = MSDeformAttnPixelDecoder(sample_mode="nearest", **kw)
    variables = dec_single.init({"params": jax.random.PRNGKey(0)}, feats,
                                train=False)
    out_single = dec_single.apply(variables, feats, train=False)
    dec_tuple = MSDeformAttnPixelDecoder(
        sample_mode=("nearest", "nearest"), **kw)
    out_tuple = dec_tuple.apply(variables, feats, train=False)
    np.testing.assert_allclose(np.asarray(out_single[0]),
                               np.asarray(out_tuple[0]), rtol=1e-6, atol=1e-7)

    # hybrid really dispatches per layer: bilinear+nearest differs from both
    dec_hybrid = MSDeformAttnPixelDecoder(
        sample_mode=("bilinear", "nearest"), **kw)
    out_hybrid = dec_hybrid.apply(variables, feats, train=False)
    assert not np.allclose(np.asarray(out_hybrid[0]),
                           np.asarray(out_tuple[0]), atol=1e-6)

    with _pytest.raises(ValueError, match="per-layer sample_mode"):
        MSDeformAttnPixelDecoder(
            sample_mode=("nearest",), **kw).apply(variables, feats,
                                                  train=False)
