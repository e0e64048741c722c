"""``control_sd15_seg.pth`` (ControlNet + SD1.5) state dict -> flax params.

The checkpoint the reference loads at ``CGAug/generate_multishift_image.py:44-46``
is a single cldm-v15 state dict with four towers:

* ``model.diffusion_model.*``  -> :class:`cgaug.sd_unet.SDUNet`
* ``control_model.*``          -> :class:`cgaug.sd_unet.ControlNetBranch`
* ``first_stage_model.*``      -> :class:`cgaug.sd_vae.AutoencoderKL`
* ``cond_stage_model.transformer.text_model.*`` -> :class:`cgaug.clip_text.CLIPTextEncoder`

Layout conversions: conv OIHW -> HWIO; 1x1 convs (zero convs, attention/latent
projections) -> Dense kernels [in, out]; linear [out, in] -> [in, out]. The
torch ``input_blocks``/``output_blocks`` indices are recovered by replaying the
same constructor walk via :func:`cgaug.sd_unet.unet_layout`, so the mapping is
structural, not name-pattern matching.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..cgaug.clip_text import CLIPTextConfig
from ..cgaug.sd_unet import SDUNetConfig, unet_layout
from ..cgaug.sd_vae import VAEConfig
from .torch2jax import _np


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _dense(w):
    return np.transpose(w, (1, 0))


def _onebyone(w):
    # [O, I, 1, 1] conv kernel -> Dense [I, O]
    return np.transpose(w[:, :, 0, 0], (1, 0))


class _B:
    """Nested-dict param builder addressed by '/'-joined flax module paths."""

    def __init__(self, sd: Dict[str, np.ndarray], prefix: str):
        self.sd = sd
        self.prefix = prefix
        self.tree: Dict = {}

    def _set(self, path: str, leaf: str, value):
        node = self.tree
        for part in path.split("/"):
            node = node.setdefault(part, {})
        node[leaf] = value

    def _get(self, key: str):
        return self.sd[self.prefix + key]

    def has(self, key: str) -> bool:
        return self.prefix + key in self.sd

    def conv(self, path: str, key: str):
        self._set(path, "kernel", _conv(self._get(key + ".weight")))
        self._set(path, "bias", self._get(key + ".bias"))

    def dense(self, path: str, key: str, bias: bool = True):
        self._set(path, "kernel", _dense(self._get(key + ".weight")))
        if bias:
            self._set(path, "bias", self._get(key + ".bias"))

    def dense1x1(self, path: str, key: str):
        self._set(path, "kernel", _onebyone(self._get(key + ".weight")))
        self._set(path, "bias", self._get(key + ".bias"))

    def norm(self, path: str, key: str):
        self._set(path, "scale", self._get(key + ".weight"))
        self._set(path, "bias", self._get(key + ".bias"))

    def raw(self, path: str, leaf: str, key: str):
        self._set(path, leaf, self._get(key))


def _res_block(b: _B, path: str, key: str):
    b.norm(f"{path}/norm_in/gn", f"{key}.in_layers.0")
    b.conv(f"{path}/conv_in", f"{key}.in_layers.2")
    b.dense(f"{path}/emb", f"{key}.emb_layers.1")
    b.norm(f"{path}/norm_out/gn", f"{key}.out_layers.0")
    b.conv(f"{path}/conv_out", f"{key}.out_layers.3")
    if b.has(f"{key}.skip_connection.weight"):
        b.dense1x1(f"{path}/skip", f"{key}.skip_connection")


def _spatial_transformer(b: _B, path: str, key: str, depth: int):
    b.norm(f"{path}/norm/gn", f"{key}.norm")
    b.dense1x1(f"{path}/proj_in", f"{key}.proj_in")
    for d in range(depth):
        tb, tk = f"{path}/block_{d}", f"{key}.transformer_blocks.{d}"
        for attn in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                b.dense(f"{tb}/{attn}/{proj}", f"{tk}.{attn}.{proj}", bias=False)
            b.dense(f"{tb}/{attn}/to_out", f"{tk}.{attn}.to_out.0")
        for n in ("norm1", "norm2", "norm3"):
            b.norm(f"{tb}/{n}", f"{tk}.{n}")
        b.dense(f"{tb}/ff_proj", f"{tk}.ff.net.0.proj")
        b.dense(f"{tb}/ff_out", f"{tk}.ff.net.2")
    b.dense1x1(f"{path}/proj_out", f"{key}.proj_out")


def _encoder_stack(b: _B, cfg: SDUNetConfig):
    """input_blocks + middle_block (shared between UNet and ControlNet)."""
    inputs, _, _, _ = unet_layout(cfg)
    for s in inputs:
        i = s["i"]
        if s["kind"] == "conv":
            b.conv(f"enc/in_{i}_conv", f"input_blocks.{i}.0")
        elif s["kind"] == "down":
            b.conv(f"enc/in_{i}_down", f"input_blocks.{i}.0.op")
        else:
            _res_block(b, f"enc/in_{i}_res", f"input_blocks.{i}.0")
            if s["st"]:
                _spatial_transformer(b, f"enc/in_{i}_st", f"input_blocks.{i}.1",
                                     cfg.transformer_depth)
    _res_block(b, "enc/mid_res1", "middle_block.0")
    _spatial_transformer(b, "enc/mid_st", "middle_block.1", cfg.transformer_depth)
    _res_block(b, "enc/mid_res2", "middle_block.2")


def convert_sd_unet(sd, cfg: SDUNetConfig, prefix: str = "model.diffusion_model."):
    b = _B(sd, prefix)
    b.dense("time_embed_0", "time_embed.0")
    b.dense("time_embed_1", "time_embed.2")
    _encoder_stack(b, cfg)
    _, _, outputs, _ = unet_layout(cfg)
    for s in outputs:
        j = s["i"]
        _res_block(b, f"out_{j}_res", f"output_blocks.{j}.0")
        slot = 1
        if s["st"]:
            _spatial_transformer(b, f"out_{j}_st", f"output_blocks.{j}.1",
                                 cfg.transformer_depth)
            slot = 2
        if s["up"]:
            b.conv(f"out_{j}_up", f"output_blocks.{j}.{slot}.conv")
    b.norm("out_norm/gn", "out.0")
    b.conv("out_conv", "out.2")
    return b.tree


def convert_controlnet(sd, cfg: SDUNetConfig, prefix: str = "control_model."):
    b = _B(sd, prefix)
    b.dense("time_embed_0", "time_embed.0")
    b.dense("time_embed_1", "time_embed.2")
    _encoder_stack(b, cfg)
    for j in range(len(cfg.hint_widths)):
        b.conv(f"hint_{j}", f"input_hint_block.{2 * j}")
    b.conv("hint_out", f"input_hint_block.{2 * len(cfg.hint_widths)}")
    inputs, _, _, _ = unet_layout(cfg)
    for s in inputs:
        b.dense1x1(f"zero_{s['i']}", f"zero_convs.{s['i']}.0")
    b.dense1x1("zero_mid", "middle_block_out.0")
    return b.tree


def _vae_res(b: _B, path: str, key: str):
    b.norm(f"{path}/norm1", f"{key}.norm1")
    b.conv(f"{path}/conv1", f"{key}.conv1")
    b.norm(f"{path}/norm2", f"{key}.norm2")
    b.conv(f"{path}/conv2", f"{key}.conv2")
    if b.has(f"{key}.nin_shortcut.weight"):
        b.dense1x1(f"{path}/shortcut", f"{key}.nin_shortcut")


def _vae_attn(b: _B, path: str, key: str):
    b.norm(f"{path}/norm", f"{key}.norm")
    for p in ("q", "k", "v", "proj_out"):
        b.dense1x1(f"{path}/{p}", f"{key}.{p}")


def convert_vae(sd, cfg: VAEConfig, prefix: str = "first_stage_model."):
    b = _B(sd, prefix)
    levels = len(cfg.ch_mult)
    # encoder
    b.conv("encoder/conv_in", "encoder.conv_in")
    res = cfg.resolution
    for l in range(levels):
        for blk in range(cfg.num_res_blocks):
            _vae_res(b, f"encoder/down_{l}_block_{blk}", f"encoder.down.{l}.block.{blk}")
            if res in cfg.attn_resolutions:
                _vae_attn(b, f"encoder/down_{l}_attn_{blk}", f"encoder.down.{l}.attn.{blk}")
        if l != levels - 1:
            b.conv(f"encoder/down_{l}_downsample", f"encoder.down.{l}.downsample.conv")
            res //= 2
    for m in ("block_1", "block_2"):
        _vae_res(b, f"encoder/mid_{m}", f"encoder.mid.{m}")
    _vae_attn(b, "encoder/mid_attn_1", "encoder.mid.attn_1")
    b.norm("encoder/norm_out", "encoder.norm_out")
    b.conv("encoder/conv_out", "encoder.conv_out")
    # decoder
    b.conv("decoder/conv_in", "decoder.conv_in")
    for m in ("block_1", "block_2"):
        _vae_res(b, f"decoder/mid_{m}", f"decoder.mid.{m}")
    _vae_attn(b, "decoder/mid_attn_1", "decoder.mid.attn_1")
    res = cfg.resolution // 2 ** (levels - 1)
    for l in reversed(range(levels)):
        for blk in range(cfg.num_res_blocks + 1):
            _vae_res(b, f"decoder/up_{l}_block_{blk}", f"decoder.up.{l}.block.{blk}")
            if res in cfg.attn_resolutions:
                _vae_attn(b, f"decoder/up_{l}_attn_{blk}", f"decoder.up.{l}.attn.{blk}")
        if l != 0:
            b.conv(f"decoder/up_{l}_upsample", f"decoder.up.{l}.upsample.conv")
            res *= 2
    b.norm("decoder/norm_out", "decoder.norm_out")
    b.conv("decoder/conv_out", "decoder.conv_out")
    b.dense1x1("quant_conv", "quant_conv")
    b.dense1x1("post_quant_conv", "post_quant_conv")
    return b.tree


def convert_clip_text(sd, cfg: CLIPTextConfig,
                      prefix: str = "cond_stage_model.transformer.text_model."):
    b = _B(sd, prefix)
    b.raw("token_embedding", "embedding", "embeddings.token_embedding.weight")
    b.tree["position_embedding"] = sd[prefix + "embeddings.position_embedding.weight"]
    for i in range(cfg.layers):
        p, k = f"layer_{i}", f"encoder.layers.{i}"
        b.dense(f"{p}/q", f"{k}.self_attn.q_proj")
        b.dense(f"{p}/k", f"{k}.self_attn.k_proj")
        b.dense(f"{p}/v", f"{k}.self_attn.v_proj")
        b.dense(f"{p}/proj", f"{k}.self_attn.out_proj")
        b.norm(f"{p}/ln1", f"{k}.layer_norm1")
        b.norm(f"{p}/ln2", f"{k}.layer_norm2")
        b.dense(f"{p}/fc1", f"{k}.mlp.fc1")
        b.dense(f"{p}/fc2", f"{k}.mlp.fc2")
    b.norm("final_ln", "final_layer_norm")
    return b.tree


def convert_control_sd15(state_dict,
                         unet_cfg: SDUNetConfig = SDUNetConfig(),
                         vae_cfg: VAEConfig = VAEConfig(),
                         clip_cfg: CLIPTextConfig = CLIPTextConfig()):
    """Full checkpoint -> {'unet','control','vae','clip'} flax param trees."""
    sd = _np(state_dict)
    return {
        "unet": convert_sd_unet(sd, unet_cfg),
        "control": convert_controlnet(sd, unet_cfg),
        "vae": convert_vae(sd, vae_cfg),
        "clip": convert_clip_text(sd, clip_cfg),
    }


def load_control_sd15(path: str, **cfgs):
    """torch.load the cldm checkpoint file and convert (accepts both flat state
    dicts and {'state_dict': ...} wrappers, as cldm/model.py load_state_dict does)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in raw:
        raw = raw["state_dict"]
    return convert_control_sd15(raw, **cfgs)
