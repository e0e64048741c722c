"""PyTorch checkpoint -> JAX pytree converters.

Maps the reference's released state dicts onto this framework's flax variable trees:
* DeepLab: ``DeepWV3Plus`` keys (``mod*/block*/convs.*`` WRN naming, Sequential-indexed
  ASPP/final heads, optional ``module.`` DataParallel prefix — see
  ``train_deeplab.py:100-110``).
* Mask2Former: detectron2 keys (``backbone.stem/res*``, ``sem_seg_head.pixel_decoder``,
  ``sem_seg_head.predictor`` incl. packed MHA ``in_proj_weight`` and the legacy
  ``static_query`` -> ``query_feat`` migration,
  ``mask2former_transformer_decoder.py:285-306``).

Layout conversions: conv OIHW -> HWIO, linear [out,in] -> [in,out]; BN weight/bias ->
scale/bias with running stats into the ``batch_stats`` collection.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


class TreeBuilder:
    def __init__(self):
        self.params: Dict[Tuple[str, ...], np.ndarray] = {}
        self.batch_stats: Dict[Tuple[str, ...], np.ndarray] = {}

    def conv(self, path: Tuple[str, ...], w, b=None):
        self.params[path + ("conv", "kernel")] = _conv(w)
        if b is not None:
            self.params[path + ("conv", "bias")] = b

    def bn(self, path: Tuple[str, ...], weight, bias, mean, var):
        self.params[path + ("bn", "scale")] = weight
        self.params[path + ("bn", "bias")] = bias
        self.batch_stats[path + ("bn", "mean")] = mean
        self.batch_stats[path + ("bn", "var")] = var

    def dense(self, path: Tuple[str, ...], w, b=None):
        self.params[path + ("kernel",)] = _dense(w)
        if b is not None:
            self.params[path + ("bias",)] = b

    def raw(self, path: Tuple[str, ...], w):
        self.params[path] = w

    def unflatten(self):
        import flax

        out = {"params": flax.traverse_util.unflatten_dict(self.params)}
        if self.batch_stats:
            out["batch_stats"] = flax.traverse_util.unflatten_dict(self.batch_stats)
        return out


def _np(state: Dict[str, "object"]) -> Dict[str, np.ndarray]:
    """torch tensors -> numpy, stripping DataParallel 'module.' prefixes."""
    out = {}
    for k, v in state.items():
        k = k[len("module."):] if k.startswith("module.") else k
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        out[k] = arr
    return out


def _bn_group(sd: Dict[str, np.ndarray], prefix: str):
    return (
        sd[f"{prefix}.weight"],
        sd[f"{prefix}.bias"],
        sd[f"{prefix}.running_mean"],
        sd[f"{prefix}.running_var"],
    )


def convert_deeplab(state_dict) -> Dict:
    """DeepWV3Plus torch state dict -> {'params', 'batch_stats'} for
    :class:`multishiftseg_tpu.models.deeplab.DeepWV3Plus`."""
    sd = _np(state_dict)
    tb = TreeBuilder()

    tb.conv(("trunk", "mod1_conv1"), sd["mod1.conv1.weight"])

    # WRN residual blocks. bnrelu = Sequential(BN, ReLU) -> '.0' index on bn paths.
    block_re = re.compile(r"^mod(\d)\.block(\d+)\.")
    seen = set()
    for key in sd:
        m = block_re.match(key)
        if not m:
            continue
        mod_id, block_id = m.group(1), m.group(2)
        base = f"mod{mod_id}.block{block_id}"
        if base in seen:
            continue
        seen.add(base)
        dst = ("trunk", f"mod{mod_id}_block{block_id}")
        tb.bn(dst + ("bn1",), *_bn_group(sd, f"{base}.bn1.0"))
        for conv_name in ("conv1", "conv2", "conv3"):
            k = f"{base}.convs.{conv_name}.weight"
            if k in sd:
                tb.conv(dst + (f"convs_{conv_name}",), sd[k])
        for bn_name in ("bn2", "bn3"):
            k = f"{base}.convs.{bn_name}.0.weight"
            if k in sd:
                tb.bn(dst + (f"convs_{bn_name}",), *_bn_group(sd, f"{base}.convs.{bn_name}.0"))
        k = f"{base}.proj_conv.weight"
        if k in sd:
            tb.conv(dst + ("proj_conv",), sd[k])

    # ASPP: features.0..3 = Sequential(conv, bn, relu); img_conv likewise.
    # (ConvBNReLU nests the Conv wrapper under a child named 'conv'.)
    for i in range(4):
        tb.conv(("aspp", f"features_{i}", "conv"), sd[f"aspp.features.{i}.0.weight"])
        tb.bn(("aspp", f"features_{i}"), *_bn_group(sd, f"aspp.features.{i}.1"))
    tb.conv(("aspp", "img_conv", "conv"), sd["aspp.img_conv.0.weight"])
    tb.bn(("aspp", "img_conv"), *_bn_group(sd, "aspp.img_conv.1"))

    tb.conv(("bot_fine",), sd["bot_fine.weight"])
    tb.conv(("bot_aspp",), sd["bot_aspp.weight"])

    # final head: Sequential(conv, bn, relu, conv, bn, relu, conv)
    tb.conv(("final_0", "conv"), sd["final.0.weight"])
    tb.bn(("final_0",), *_bn_group(sd, "final.1"))
    tb.conv(("final_1", "conv"), sd["final.3.weight"])
    tb.bn(("final_1",), *_bn_group(sd, "final.4"))
    tb.conv(("final_cls",), sd["final.6.weight"])
    tb.conv(("ood_head",), sd["ood_head.weight"])

    return tb.unflatten()


def _convert_swin_into(tb: TreeBuilder, sd: Dict[str, np.ndarray], p: str,
                       dst: Tuple[str, ...]) -> None:
    """Map Swin keys under prefix ``p`` (e.g. 'backbone.') onto the flax
    :class:`multishiftseg_tpu.models.swin.SwinTransformer` tree at ``dst``.

    Source layout: the reference's timm-style ``SwinTransformer``
    (``modeling/backbone/swin.py:498-683``) — ``patch_embed.proj/.norm``,
    ``layers.{s}.blocks.{b}.{norm1,attn.{qkv,proj,relative_position_bias_table},
    norm2,mlp.{fc1,fc2}}``, ``layers.{s}.downsample.{norm,reduction}``, and the
    per-stage output norms ``norm{s}`` added by ``out_indices``. Buffers
    (``relative_position_index``, ``attn_mask``) are index tables recomputed on our
    side and skipped.
    """
    tb.raw(dst + ("patch_embed", "kernel"), _conv(sd[f"{p}patch_embed.proj.weight"]))
    tb.raw(dst + ("patch_embed", "bias"), sd[f"{p}patch_embed.proj.bias"])
    if f"{p}patch_embed.norm.weight" in sd:
        tb.raw(dst + ("patch_norm", "scale"), sd[f"{p}patch_embed.norm.weight"])
        tb.raw(dst + ("patch_norm", "bias"), sd[f"{p}patch_embed.norm.bias"])

    blk_re = re.compile(re.escape(p) + r"layers\.(\d+)\.blocks\.(\d+)\.")
    seen = set()
    for key in sd:
        m = blk_re.match(key)
        if not m:
            continue
        s, b = m.group(1), m.group(2)
        base = f"{p}layers.{s}.blocks.{b}"
        if base in seen:
            continue
        seen.add(base)
        d = dst + (f"stage{s}_block{b}",)
        for norm in ("norm1", "norm2"):
            tb.raw(d + (norm, "scale"), sd[f"{base}.{norm}.weight"])
            tb.raw(d + (norm, "bias"), sd[f"{base}.{norm}.bias"])
        tb.dense(d + ("attn", "qkv"), sd[f"{base}.attn.qkv.weight"],
                 sd.get(f"{base}.attn.qkv.bias"))
        tb.dense(d + ("attn", "proj"), sd[f"{base}.attn.proj.weight"],
                 sd[f"{base}.attn.proj.bias"])
        tb.raw(d + ("attn", "relative_position_bias_table"),
               sd[f"{base}.attn.relative_position_bias_table"])
        tb.dense(d + ("mlp_fc1",), sd[f"{base}.mlp.fc1.weight"], sd[f"{base}.mlp.fc1.bias"])
        tb.dense(d + ("mlp_fc2",), sd[f"{base}.mlp.fc2.weight"], sd[f"{base}.mlp.fc2.bias"])

    for s in range(4):
        if f"{p}layers.{s}.downsample.reduction.weight" in sd:
            d = dst + (f"downsample{s}",)
            tb.raw(d + ("norm", "scale"), sd[f"{p}layers.{s}.downsample.norm.weight"])
            tb.raw(d + ("norm", "bias"), sd[f"{p}layers.{s}.downsample.norm.bias"])
            tb.dense(d + ("reduction",), sd[f"{p}layers.{s}.downsample.reduction.weight"])
        if f"{p}norm{s}.weight" in sd:
            tb.raw(dst + (f"out_norm{s}", "scale"), sd[f"{p}norm{s}.weight"])
            tb.raw(dst + (f"out_norm{s}", "bias"), sd[f"{p}norm{s}.bias"])


def convert_swin(state_dict, prefix: str = "") -> Dict:
    """Standalone Swin backbone state dict (e.g. an IN1k/IN21k pretrain) ->
    variables for :class:`multishiftseg_tpu.models.swin.SwinTransformer`."""
    sd = _np(state_dict)
    tb = TreeBuilder()
    _convert_swin_into(tb, sd, prefix, ())
    return tb.unflatten()


def convert_maskformer(state_dict, dec_layers: int = 9) -> Dict:
    """detectron2 MaskFormer (R-50 + MSDeformAttn + GMA decoder) state dict ->
    variables for :class:`multishiftseg_tpu.models.maskformer.MaskFormer`."""
    sd = _np(state_dict)
    # legacy key migration (reference decoder _load_from_state_dict)
    for k in list(sd):
        if "static_query" in k:
            sd[k.replace("static_query", "query_feat")] = sd.pop(k)
    tb = TreeBuilder()

    # ---- backbone (d2 ResNet or D2SwinTransformer; optional for head-only dicts) ----
    if "backbone.patch_embed.proj.weight" in sd:
        _convert_swin_into(tb, sd, "backbone.", ("backbone",))
    if "backbone.stem.conv1.weight" in sd:
        tb.conv(("backbone", "stem_conv1"), sd["backbone.stem.conv1.weight"])
        tb.bn(("backbone", "stem_norm1"), *_bn_group(sd, "backbone.stem.conv1.norm"))
    res_re = re.compile(r"^backbone\.res(\d)\.(\d+)\.")
    seen = set()
    for key in sd:
        m = res_re.match(key)
        if not m:
            continue
        stage, block = m.group(1), m.group(2)
        base = f"backbone.res{stage}.{block}"
        if base in seen:
            continue
        seen.add(base)
        dst = ("backbone", f"res{stage}_{block}")
        for i in (1, 2, 3):
            tb.conv(dst + (f"conv{i}",), sd[f"{base}.conv{i}.weight"])
            tb.bn(dst + (f"norm{i}",), *_bn_group(sd, f"{base}.conv{i}.norm"))
        if f"{base}.shortcut.weight" in sd:
            tb.conv(dst + ("shortcut",), sd[f"{base}.shortcut.weight"])
            tb.bn(dst + ("shortcut_norm",), *_bn_group(sd, f"{base}.shortcut.norm"))

    # ---- pixel decoder (optional: backbone-only dicts) ----
    pd = "sem_seg_head.pixel_decoder"
    dst_pd = ("pixel_decoder",)
    if f"{pd}.mask_features.weight" not in sd:
        return tb.unflatten()
    for i in range(3):
        tb.conv(dst_pd + (f"input_proj_{i}",),
                sd[f"{pd}.input_proj.{i}.0.weight"], sd[f"{pd}.input_proj.{i}.0.bias"])
        tb.raw(dst_pd + (f"input_proj_{i}_gn", "scale"), sd[f"{pd}.input_proj.{i}.1.weight"])
        tb.raw(dst_pd + (f"input_proj_{i}_gn", "bias"), sd[f"{pd}.input_proj.{i}.1.bias"])
    tb.raw(dst_pd + ("level_embed",), sd[f"{pd}.transformer.level_embed"])
    for i in range(6):
        enc = f"{pd}.transformer.encoder.layers.{i}"
        dl = dst_pd + (f"encoder_layer_{i}",)
        attn = f"{enc}.self_attn"
        for lin in ("sampling_offsets", "attention_weights", "value_proj", "output_proj"):
            tb.dense(dl + ("self_attn", lin), sd[f"{attn}.{lin}.weight"], sd[f"{attn}.{lin}.bias"])
        tb.dense(dl + ("linear1",), sd[f"{enc}.linear1.weight"], sd[f"{enc}.linear1.bias"])
        tb.dense(dl + ("linear2",), sd[f"{enc}.linear2.weight"], sd[f"{enc}.linear2.bias"])
        tb.raw(dl + ("norm1", "scale"), sd[f"{enc}.norm1.weight"])
        tb.raw(dl + ("norm1", "bias"), sd[f"{enc}.norm1.bias"])
        tb.raw(dl + ("norm2", "scale"), sd[f"{enc}.norm2.weight"])
        tb.raw(dl + ("norm2", "bias"), sd[f"{enc}.norm2.bias"])
    tb.conv(dst_pd + ("adapter_1",), sd[f"{pd}.adapter_1.weight"])
    tb.raw(dst_pd + ("adapter_1_gn", "scale"), sd[f"{pd}.adapter_1.norm.weight"])
    tb.raw(dst_pd + ("adapter_1_gn", "bias"), sd[f"{pd}.adapter_1.norm.bias"])
    tb.conv(dst_pd + ("layer_1",), sd[f"{pd}.layer_1.weight"])
    tb.raw(dst_pd + ("layer_1_gn", "scale"), sd[f"{pd}.layer_1.norm.weight"])
    tb.raw(dst_pd + ("layer_1_gn", "bias"), sd[f"{pd}.layer_1.norm.bias"])
    tb.conv(dst_pd + ("mask_features",),
            sd[f"{pd}.mask_features.weight"], sd[f"{pd}.mask_features.bias"])

    # ---- transformer decoder (GMA) ----
    pr = "sem_seg_head.predictor"
    dst_pr = ("predictor",)
    tb.raw(dst_pr + ("query_feat",), sd[f"{pr}.query_feat.weight"])
    tb.raw(dst_pr + ("query_embed",), sd[f"{pr}.query_embed.weight"])
    tb.raw(dst_pr + ("level_embed",), sd[f"{pr}.level_embed.weight"])

    def mha(dst, src):
        w = sd[f"{src}.in_proj_weight"]
        b = sd[f"{src}.in_proj_bias"]
        d = w.shape[1]
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            tb.dense(dst + (name,), w[i * d : (i + 1) * d], b[i * d : (i + 1) * d])
        tb.dense(dst + ("out_proj",), sd[f"{src}.out_proj.weight"], sd[f"{src}.out_proj.bias"])

    def ln(dst, src):
        tb.raw(dst + ("scale",), sd[f"{src}.weight"])
        tb.raw(dst + ("bias",), sd[f"{src}.bias"])

    for i in range(dec_layers):
        mha(dst_pr + (f"cross_{i}", "multihead_attn_foreground"),
            f"{pr}.transformer_cross_attention_layers.{i}.multihead_attn_foreground")
        mha(dst_pr + (f"cross_{i}", "multihead_attn_background"),
            f"{pr}.transformer_cross_attention_layers.{i}.multihead_attn_background")
        ln(dst_pr + (f"cross_{i}", "norm"), f"{pr}.transformer_cross_attention_layers.{i}.norm")
        mha(dst_pr + (f"self_{i}", "self_attn"),
            f"{pr}.transformer_self_attention_layers.{i}.self_attn")
        ln(dst_pr + (f"self_{i}", "norm"), f"{pr}.transformer_self_attention_layers.{i}.norm")
        tb.dense(dst_pr + (f"ffn_{i}", "linear1"),
                 sd[f"{pr}.transformer_ffn_layers.{i}.linear1.weight"],
                 sd[f"{pr}.transformer_ffn_layers.{i}.linear1.bias"])
        tb.dense(dst_pr + (f"ffn_{i}", "linear2"),
                 sd[f"{pr}.transformer_ffn_layers.{i}.linear2.weight"],
                 sd[f"{pr}.transformer_ffn_layers.{i}.linear2.bias"])
        ln(dst_pr + (f"ffn_{i}", "norm"), f"{pr}.transformer_ffn_layers.{i}.norm")

    ln(dst_pr + ("decoder_norm",), f"{pr}.decoder_norm")
    tb.dense(dst_pr + ("class_embed",), sd[f"{pr}.class_embed.weight"],
             sd[f"{pr}.class_embed.bias"])
    # Stock (non-anomaly) Mask2Former checkpoints lack the OOD head; initialize it
    # by weight copy exactly like the reference fine-tuning setup
    # (``train_m2f.py:125-132``).
    ce2 = f"{pr}.class_embed2" if f"{pr}.class_embed2.weight" in sd else f"{pr}.class_embed"
    tb.dense(dst_pr + ("class_embed2",), sd[f"{ce2}.weight"], sd[f"{ce2}.bias"])
    for i in range(3):
        tb.dense(dst_pr + ("mask_embed", f"layers_{i}"),
                 sd[f"{pr}.mask_embed.layers.{i}.weight"],
                 sd[f"{pr}.mask_embed.layers.{i}.bias"])

    return tb.unflatten()


def load_torch_checkpoint(path: str):
    """Load a torch checkpoint file without requiring CUDA."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    if isinstance(state, dict) and isinstance(state.get("model"), dict) and not any(
        # unwrap d2-style {"model": sd, "iteration": ...} wrappers; the key
        # "model" itself must not veto the check (it startswith "mod")
        k != "model" and k.startswith(("mod", "backbone", "sem_seg_head"))
        for k in state
    ):
        state = state["model"]
    return state
