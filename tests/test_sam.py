"""SAM (cgaug/sam.py + convert/sam.py) tests.

The ``segment_anything`` package is not installed in this environment and the
reference does not vendor it (it imports the pip package,
``generate_multishift_image.py:14``), so no torch golden oracle exists offline.
Coverage strategy instead:

* converter completeness: a synthetic state dict with the EXACT public
  ``sam_vit_*`` key/shape manifest converts into a tree structurally identical
  to ``SAM.init``'s (every leaf shape checked), with only the mask-input /
  point keys skipped;
* math oracles in numpy: decomposed relative-position attention vs a naive
  per-pixel loop; window partition roundtrip; the random-Fourier prompt PE and
  corner-embedding formulas;
* torch layout oracles for the risky conversions (ConvTranspose2d kernels);
* predictor end-to-end: set_image -> predict(box) at non-square resolutions.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from multishiftseg_tpu.cgaug.sam import (SAM, SamPredictor, SAMSegmenter,
                                         ViTAttention, tiny_sam_config,
                                         window_partition, window_unpartition)
from multishiftseg_tpu.convert.sam import (convert_sam, sam_state_dict_template)


def _synthetic_sd(cfg, seed=0):
    rng = np.random.RandomState(seed)
    return {k: rng.randn(*shape).astype(np.float32) * 0.1
            for k, shape in sam_state_dict_template(cfg).items()}


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_sam_config()
    params, skipped = convert_sam(_synthetic_sd(cfg), cfg)
    return cfg, params, skipped


@pytest.mark.slow
def test_converter_structure_matches_init(tiny):
    cfg, params, skipped = tiny
    x = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
    boxes = jnp.asarray([[4.0, 4.0, 40.0, 40.0]])
    ref = SAM(cfg).init(jax.random.PRNGKey(0), x, boxes)["params"]
    ref_shapes = jax.tree.map(jnp.shape, ref)
    got_shapes = jax.tree.map(np.shape, params)
    assert ref_shapes == got_shapes
    assert all("mask_downscaling" in k or "not_a_point" in k for k in skipped), skipped


def test_converted_forward_runs(tiny):
    cfg, params, _ = tiny
    x = jnp.asarray(np.random.RandomState(1).rand(1, cfg.img_size, cfg.img_size, 3),
                    jnp.float32)
    boxes = jnp.asarray([[4.0, 4.0, 40.0, 40.0]])
    masks, iou = SAM(cfg).apply({"params": params}, x, boxes)
    g = cfg.img_size // cfg.patch
    assert masks.shape == (1, cfg.num_multimask + 1, 4 * g, 4 * g)
    assert iou.shape == (1, cfg.num_multimask + 1)
    assert np.isfinite(np.asarray(masks)).all()


def test_window_partition_roundtrip():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 7, 9, 5), jnp.float32)
    wins, pad_hw = window_partition(x, 4)
    assert wins.shape == (2 * 2 * 3, 4, 4, 5)
    back = window_unpartition(wins, 4, pad_hw, (7, 9))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_rel_pos_attention_matches_naive_loop():
    """The einsum-decomposed rel-pos logits equal the published formula
    attn[q=(x,y), k=(i,j)] += q_vec . Rh[x-i+H-1] + q_vec . Rw[y-j+W-1]."""
    heads, h, w, c = 2, 3, 4, 8
    attn = ViTAttention(heads)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, h, w, c), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.randn(*a.shape), jnp.float32) * 0.3, params)
    out = attn.apply({"params": params}, x)

    # naive numpy recomputation
    d = c // heads
    kern = np.asarray(params["qkv"]["kernel"])  # [c, 3, heads, d]
    bias = np.asarray(params["qkv"]["bias"])
    qkv = np.einsum("bxyc,cthd->btxyhd", np.asarray(x), kern) + bias[None, :, None, None]
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
    rel_h = np.asarray(params["rel_pos_h"])
    rel_w = np.asarray(params["rel_pos_w"])
    logits = np.zeros((1, heads, h, w, h, w), np.float64)
    for hd in range(heads):
        for (x0, y0) in np.ndindex(h, w):
            for (x1, y1) in np.ndindex(h, w):
                qv = q[0, x0, y0, hd]
                s = qv @ k[0, x1, y1, hd] * d ** -0.5
                s += qv @ rel_h[x0 - x1 + h - 1]
                s += qv @ rel_w[y0 - y1 + w - 1]
                logits[0, hd, x0, y0, x1, y1] = s
    probs = np.exp(logits - logits.max(axis=(4, 5), keepdims=True))
    probs /= probs.sum(axis=(4, 5), keepdims=True)
    ctx = np.einsum("bhxyij,bijhd->bxyhd", probs, v).reshape(1, h, w, c)
    expect = ctx @ np.asarray(params["proj"]["kernel"]) + np.asarray(
        params["proj"]["bias"])
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5, rtol=1e-4)


def test_conv_transpose_layout_matches_torch():
    torch = pytest.importorskip("torch")
    from flax import linen as nn

    from multishiftseg_tpu.convert.sam import _convT

    t = torch.nn.ConvTranspose2d(6, 3, kernel_size=2, stride=2)
    with torch.no_grad():
        for p in t.parameters():
            p.uniform_(-0.3, 0.3)
    x = np.random.RandomState(4).randn(1, 6, 5, 7).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.tensor(x)).numpy()
    m = nn.ConvTranspose(3, (2, 2), strides=(2, 2), padding="VALID")
    params = {"kernel": jnp.asarray(_convT(t.weight.detach().numpy())),
              "bias": jnp.asarray(t.bias.detach().numpy())}
    got = m.apply({"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), ref,
                               atol=1e-6, rtol=1e-6)


def test_box_prompt_embedding_formula(tiny):
    """Corner tokens = fourier_pe((xy+0.5)/size) + point_embeddings[2|3]
    (segment_anything PromptEncoder._embed_boxes)."""
    cfg, params, _ = tiny
    from multishiftseg_tpu.cgaug.sam import SAMPromptEncoder

    pe = SAMPromptEncoder(cfg)
    box = jnp.asarray([[3.0, 5.0, 20.0, 30.0]])
    sparse, dense, image_pe = pe.apply(
        {"params": params["prompt_encoder"]}, box)
    gauss = np.asarray(params["prompt_encoder"]["pe_gaussian"])
    corners = np.asarray(params["prompt_encoder"]["point_embeddings"])

    def fourier(pt):
        c = (2.0 * (pt + 0.5) / cfg.img_size - 1.0) @ gauss * 2 * np.pi
        return np.concatenate([np.sin(c), np.cos(c)])

    np.testing.assert_allclose(np.asarray(sparse[0, 0]),
                               fourier(np.array([3.0, 5.0])) + corners[2],
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sparse[0, 1]),
                               fourier(np.array([20.0, 30.0])) + corners[3],
                               atol=1e-5, rtol=1e-4)
    g = cfg.img_size // cfg.patch
    assert dense.shape == (1, g, g, cfg.embed_dim)
    assert image_pe.shape == (g, g, cfg.embed_dim)
    np.testing.assert_allclose(
        np.asarray(dense[0, 3, 2]),
        np.asarray(params["prompt_encoder"]["no_mask_embed"]), atol=1e-6)


@pytest.mark.slow
def test_predictor_end_to_end(tiny):
    cfg, params, _ = tiny
    pred = SamPredictor(params, cfg)
    img = (np.random.RandomState(5).rand(48, 32, 3) * 255).astype(np.uint8)
    pred.set_image(img)
    masks, iou, low = pred.predict(box=np.array([[4, 4, 28, 40]]),
                                   multimask_output=False)
    assert masks.shape == (1, 48, 32) and masks.dtype == bool
    assert iou.shape == (1,)
    g = cfg.img_size // cfg.patch
    assert low.shape == (1, 4 * g, 4 * g)
    # multimask returns the 3 alternates
    m3, i3, _ = pred.predict(box=np.array([[4, 4, 28, 40]]), multimask_output=True)
    assert m3.shape == (3, 48, 32) and i3.shape == (3,)


def test_segmenter_protocol(tiny):
    cfg, params, _ = tiny
    seg = SAMSegmenter(params, cfg)
    img = (np.random.RandomState(6).rand(40, 40, 3) * 255).astype(np.uint8)
    mask = seg.segment_box(img, np.array([8, 8, 30, 30]))
    assert mask.shape == (40, 40) and mask.dtype == bool


def _np_dense(p, x):
    return x @ np.asarray(p["kernel"]) + np.asarray(p["bias"])


def _np_attention(p, q, k, v, heads):
    """segment_anything modeling/transformer.py::Attention in numpy."""
    qq, kk, vv = _np_dense(p["q_proj"], q), _np_dense(p["k_proj"], k), _np_dense(p["v_proj"], v)
    b, n, inner = qq.shape
    d = inner // heads
    qq = qq.reshape(b, n, heads, d)
    kk = kk.reshape(b, -1, heads, d)
    vv = vv.reshape(b, -1, heads, d)
    sim = np.einsum("bnhd,bmhd->bhnm", qq, kk) / np.sqrt(d)
    sim = sim - sim.max(-1, keepdims=True)
    pm = np.exp(sim)
    pm /= pm.sum(-1, keepdims=True)
    o = np.einsum("bhnm,bmhd->bnhd", pm, vv).reshape(b, n, inner)
    return _np_dense(p["out_proj"], o)


def _np_ln(p, x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * np.asarray(p["scale"]) + np.asarray(p["bias"])


@pytest.mark.parametrize("skip_first", [True, False])
def test_two_way_block_matches_published_formula(skip_first):
    """The two-way decoder block vs a numpy oracle implementing the PUBLISHED
    segment_anything ``TwoWayAttentionBlock.forward`` exactly — in particular
    the ``skip_first_layer_pe`` branch REPLACES queries with the self-attention
    output (no residual) before norm1."""
    from multishiftseg_tpu.cgaug.sam import _TwoWayBlock

    cfg = tiny_sam_config()
    rng = np.random.RandomState(3)
    q = rng.randn(2, 5, cfg.embed_dim).astype(np.float32)
    keys = rng.randn(2, 9, cfg.embed_dim).astype(np.float32)
    qpe = rng.randn(2, 5, cfg.embed_dim).astype(np.float32)
    kpe = rng.randn(2, 9, cfg.embed_dim).astype(np.float32)

    blk = _TwoWayBlock(cfg, skip_first_pe=skip_first)
    var = blk.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(keys),
                   jnp.asarray(qpe), jnp.asarray(kpe))
    out_q, out_k = blk.apply(var, jnp.asarray(q), jnp.asarray(keys),
                             jnp.asarray(qpe), jnp.asarray(kpe))

    p = jax.tree.map(np.asarray, var["params"])
    heads = cfg.decoder_heads
    # --- numpy oracle: TwoWayAttentionBlock.forward ---
    queries = q
    if skip_first:
        queries = _np_attention(p["self_attn"], queries, queries, queries, heads)
    else:
        qq = queries + qpe
        queries = queries + _np_attention(p["self_attn"], qq, qq, queries, heads)
    queries = _np_ln(p["norm1"], queries)
    a = _np_attention(p["cross_attn_token_to_image"], queries + qpe, keys + kpe,
                      keys, heads)
    queries = _np_ln(p["norm2"], queries + a)
    m = _np_dense(p["mlp_lin2"], np.maximum(_np_dense(p["mlp_lin1"], queries), 0.0))
    queries = _np_ln(p["norm3"], queries + m)
    a = _np_attention(p["cross_attn_image_to_token"], keys + kpe, queries + qpe,
                      queries, heads)
    expect_k = _np_ln(p["norm4"], keys + a)

    np.testing.assert_allclose(np.asarray(out_q), queries, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_k), expect_k, atol=2e-5)
