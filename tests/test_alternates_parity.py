"""Golden parity for the registered ALTERNATE heads vs their reference torch
modules: the plain FPN pixel decoder (``fpn.py:38-161``) and the vanilla
Mask2Former transformer decoder (``mask2former_transformer_decoder.py:575-830``),
random weights, fp32 CPU. Uses the stub harness from test_m2f_parity."""

import sys
import types

import numpy as np
import pytest

from test_m2f_parity import _install_stubs, _load

import flax

from multishiftseg_tpu.convert.torch2jax import _conv, _dense

CONV_DIM = 256
FEAT_SHAPES = {"res2": (256, 16, 24), "res3": (512, 8, 12),
               "res4": (1024, 4, 6), "res5": (2048, 2, 3)}


@pytest.fixture(scope="module")
def fpn_mod():
    pytest.importorskip("torch")
    _install_stubs()
    return _load("refm2f.modeling.pixel_decoder.fpn")


@pytest.fixture(scope="module")
def dec_mod():
    pytest.importorskip("torch")
    _install_stubs()
    return _load("refm2f.modeling.transformer_decoder.mask2former_transformer_decoder")


def _np(t):
    return t.detach().numpy()


def _ln(sd, key):
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def _feats(rng):
    return {k: (rng.randn(1, c, h, w) * 0.5).astype(np.float32)
            for k, (c, h, w) in FEAT_SHAPES.items()}


def test_base_pixel_decoder_parity(fpn_mod, rng):
    import torch

    from multishiftseg_tpu.models.fpn_decoder import BasePixelDecoder

    ShapeSpec = sys.modules["detectron2.layers"].ShapeSpec
    torch.manual_seed(0)
    input_shape = {k: ShapeSpec(channels=c, stride=s)
                   for (k, (c, _, _)), s in zip(FEAT_SHAPES.items(), (4, 8, 16, 32))}
    ref = fpn_mod.BasePixelDecoder(input_shape=input_shape, conv_dim=CONV_DIM,
                                   mask_dim=CONV_DIM, norm="GN")
    ref.eval()
    sd = ref.state_dict()

    p = {}
    for i, has_lateral in ((1, True), (2, True), (3, True), (4, False)):
        if has_lateral:
            p[(f"adapter_{i}", "conv", "kernel")] = _conv(_np(sd[f"adapter_{i}.weight"]))
            p[(f"adapter_{i}_gn", "scale")] = _np(sd[f"adapter_{i}.norm.weight"])
            p[(f"adapter_{i}_gn", "bias")] = _np(sd[f"adapter_{i}.norm.bias"])
        p[(f"layer_{i}", "conv", "kernel")] = _conv(_np(sd[f"layer_{i}.weight"]))
        p[(f"layer_{i}_gn", "scale")] = _np(sd[f"layer_{i}.norm.weight"])
        p[(f"layer_{i}_gn", "bias")] = _np(sd[f"layer_{i}.norm.bias"])
    p[("mask_features", "conv", "kernel")] = _conv(_np(sd["mask_features.weight"]))
    p[("mask_features", "conv", "bias")] = _np(sd["mask_features.bias"])
    params = flax.traverse_util.unflatten_dict(p)

    feats = _feats(rng)
    with torch.no_grad():
        mf_t, _, ms_t = ref.forward_features(
            {k: torch.from_numpy(v) for k, v in feats.items()}
        )
    ours = BasePixelDecoder(conv_dim=CONV_DIM, mask_dim=CONV_DIM)
    mf_j, _, ms_j = ours.apply(
        {"params": params}, {k: v.transpose(0, 2, 3, 1) for k, v in feats.items()}
    )
    np.testing.assert_allclose(np.transpose(np.asarray(mf_j), (0, 3, 1, 2)),
                               mf_t.numpy(), atol=1e-4, rtol=1e-4)
    assert len(ms_j) == len(ms_t) == 3
    for a, b in zip(ms_j, ms_t):
        np.testing.assert_allclose(np.transpose(np.asarray(a), (0, 3, 1, 2)),
                                   b.numpy(), atol=1e-4, rtol=1e-4)


def test_vanilla_m2f_decoder_parity(dec_mod, rng):
    import torch

    from multishiftseg_tpu.models.transformer_decoder import (
        MultiScaleMaskedTransformerDecoder,
    )

    torch.manual_seed(1)
    DEC_LAYERS, NQ, NH = 9, 100, 8
    ref = dec_mod.MultiScaleMaskedTransformerDecoder(
        in_channels=CONV_DIM, num_classes=19, hidden_dim=CONV_DIM,
        num_queries=NQ, nheads=NH, dim_feedforward=2048, dec_layers=DEC_LAYERS,
        pre_norm=False, mask_dim=CONV_DIM, enforce_input_project=False,
    )
    ref.eval()
    sd = ref.state_dict()

    p = {}
    p[("query_feat",)] = _np(sd["query_feat.weight"])
    p[("query_embed",)] = _np(sd["query_embed.weight"])
    p[("level_embed",)] = _np(sd["level_embed.weight"])

    def mha(dst, src):
        w, b = _np(sd[f"{src}.in_proj_weight"]), _np(sd[f"{src}.in_proj_bias"])
        d = w.shape[1]
        for i, nm in enumerate(("q_proj", "k_proj", "v_proj")):
            p[dst + (nm, "kernel")] = _dense(w[i * d:(i + 1) * d])
            p[dst + (nm, "bias")] = b[i * d:(i + 1) * d]
        p[dst + ("out_proj", "kernel")] = _dense(_np(sd[f"{src}.out_proj.weight"]))
        p[dst + ("out_proj", "bias")] = _np(sd[f"{src}.out_proj.bias"])

    for i in range(DEC_LAYERS):
        mha((f"cross_{i}", "multihead_attn"),
            f"transformer_cross_attention_layers.{i}.multihead_attn")
        for k, v in _ln(sd, f"transformer_cross_attention_layers.{i}.norm").items():
            p[(f"cross_{i}", "norm", k)] = v
        mha((f"self_{i}", "self_attn"),
            f"transformer_self_attention_layers.{i}.self_attn")
        for k, v in _ln(sd, f"transformer_self_attention_layers.{i}.norm").items():
            p[(f"self_{i}", "norm", k)] = v
        for lin in ("linear1", "linear2"):
            p[(f"ffn_{i}", lin, "kernel")] = _dense(
                _np(sd[f"transformer_ffn_layers.{i}.{lin}.weight"]))
            p[(f"ffn_{i}", lin, "bias")] = _np(
                sd[f"transformer_ffn_layers.{i}.{lin}.bias"])
        for k, v in _ln(sd, f"transformer_ffn_layers.{i}.norm").items():
            p[(f"ffn_{i}", "norm", k)] = v
    for k, v in _ln(sd, "decoder_norm").items():
        p[("decoder_norm", k)] = v
    p[("class_embed", "kernel")] = _dense(_np(sd["class_embed.weight"]))
    p[("class_embed", "bias")] = _np(sd["class_embed.bias"])
    for i in range(3):
        p[("mask_embed", f"layers_{i}", "kernel")] = _dense(
            _np(sd[f"mask_embed.layers.{i}.weight"]))
        p[("mask_embed", f"layers_{i}", "bias")] = _np(
            sd[f"mask_embed.layers.{i}.bias"])
    params = flax.traverse_util.unflatten_dict(p)

    # multi-scale inputs low->high res + stride-4 mask features
    ms = [(rng.randn(1, CONV_DIM, h, w) * 0.5).astype(np.float32)
          for (h, w) in ((2, 3), (4, 6), (8, 12))]
    mask_feat = (rng.randn(1, CONV_DIM, 16, 24) * 0.5).astype(np.float32)
    import torch as T

    with torch.no_grad():
        out_t = ref([T.from_numpy(x) for x in ms], T.from_numpy(mask_feat))
    ours = MultiScaleMaskedTransformerDecoder(
        num_classes=19, hidden_dim=CONV_DIM, num_queries=NQ, nheads=NH,
        dim_feedforward=2048, dec_layers=DEC_LAYERS, mask_dim=CONV_DIM,
    )
    out_j = ours.apply(
        {"params": params},
        [np.transpose(x, (0, 2, 3, 1)) for x in ms],
        np.transpose(mask_feat, (0, 2, 3, 1)),
    )
    for key in ("pred_logits", "pred_masks"):
        np.testing.assert_allclose(np.asarray(out_j[key]),
                                   out_t[key].numpy(), atol=2e-3, rtol=1e-3,
                                   err_msg=key)
    assert len(out_j["aux_outputs"]) == len(out_t["aux_outputs"])
    for a_j, a_t in zip(out_j["aux_outputs"], out_t["aux_outputs"]):
        for key in a_t:
            np.testing.assert_allclose(np.asarray(a_j[key]), a_t[key].numpy(),
                                       atol=2e-3, rtol=1e-3)


def test_maskformer_v1_decoder_parity(dec_mod, rng):
    """StandardTransformerDecoder (MaskFormer-v1, DETR transformer) vs the
    reference torch module (``maskformer_transformer_decoder.py:30-188``)."""
    import torch

    from multishiftseg_tpu.models.maskformer_v1_decoder import (
        StandardTransformerDecoder,
    )

    from test_m2f_parity import _load

    v1_mod = _load(
        "refm2f.modeling.transformer_decoder.maskformer_transformer_decoder"
    )
    torch.manual_seed(2)
    DEC, NQ, NH = 6, 100, 8
    ref = v1_mod.StandardTransformerDecoder(
        in_channels=CONV_DIM, num_classes=19, hidden_dim=CONV_DIM, num_queries=NQ,
        nheads=NH, dropout=0.0, dim_feedforward=2048, enc_layers=0, dec_layers=DEC,
        pre_norm=False, deep_supervision=True, mask_dim=CONV_DIM,
        enforce_input_project=False,
    )
    ref.eval()
    sd = ref.state_dict()

    p = {}
    p[("query_embed",)] = _np(sd["query_embed.weight"])

    def mha(dst, src):
        w, b = _np(sd[f"{src}.in_proj_weight"]), _np(sd[f"{src}.in_proj_bias"])
        dm = w.shape[1]
        for i, nm in enumerate(("q_proj", "k_proj", "v_proj")):
            p[dst + (nm, "kernel")] = _dense(w[i * dm:(i + 1) * dm])
            p[dst + (nm, "bias")] = b[i * dm:(i + 1) * dm]
        p[dst + ("out_proj", "kernel")] = _dense(_np(sd[f"{src}.out_proj.weight"]))
        p[dst + ("out_proj", "bias")] = _np(sd[f"{src}.out_proj.bias"])

    for i in range(DEC):
        base = f"transformer.decoder.layers.{i}"
        mha((f"layer_{i}", "self_attn"), f"{base}.self_attn")
        mha((f"layer_{i}", "multihead_attn"), f"{base}.multihead_attn")
        for lin in ("linear1", "linear2"):
            p[(f"layer_{i}", lin, "kernel")] = _dense(_np(sd[f"{base}.{lin}.weight"]))
            p[(f"layer_{i}", lin, "bias")] = _np(sd[f"{base}.{lin}.bias"])
        for norm in ("norm1", "norm2", "norm3"):
            for k, v in _ln(sd, f"{base}.{norm}").items():
                p[(f"layer_{i}", norm, k)] = v
    for k, v in _ln(sd, "transformer.decoder.norm").items():
        p[("decoder_norm", k)] = v
    p[("class_embed", "kernel")] = _dense(_np(sd["class_embed.weight"]))
    p[("class_embed", "bias")] = _np(sd["class_embed.bias"])
    for i in range(3):
        p[("mask_embed", f"layers_{i}", "kernel")] = _dense(
            _np(sd[f"mask_embed.layers.{i}.weight"]))
        p[("mask_embed", f"layers_{i}", "bias")] = _np(
            sd[f"mask_embed.layers.{i}.bias"])
    import flax as _flax
    params = _flax.traverse_util.unflatten_dict(p)

    x = (rng.randn(1, CONV_DIM, 4, 6) * 0.5).astype(np.float32)
    mask_feat = (rng.randn(1, CONV_DIM, 16, 24) * 0.5).astype(np.float32)
    import torch as T

    with torch.no_grad():
        out_t = ref(T.from_numpy(x), T.from_numpy(mask_feat))
    ours = StandardTransformerDecoder(
        num_classes=19, hidden_dim=CONV_DIM, num_queries=NQ, nheads=NH,
        dim_feedforward=2048, dec_layers=DEC, mask_dim=CONV_DIM,
    )
    out_j = ours.apply({"params": params}, np.transpose(x, (0, 2, 3, 1)),
                       np.transpose(mask_feat, (0, 2, 3, 1)))
    for key in ("pred_logits", "pred_masks"):
        np.testing.assert_allclose(np.asarray(out_j[key]), out_t[key].numpy(),
                                   atol=2e-3, rtol=1e-3, err_msg=key)
    assert len(out_j["aux_outputs"]) == len(out_t["aux_outputs"]) == DEC - 1
    for a_j, a_t in zip(out_j["aux_outputs"], out_t["aux_outputs"]):
        for key in a_t:
            np.testing.assert_allclose(np.asarray(a_j[key]), a_t[key].numpy(),
                                       atol=2e-3, rtol=1e-3)
