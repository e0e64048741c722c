"""``sam_vit_h_4b8939.pth`` (Segment Anything) state dict -> flax params.

Key layout follows the public segment-anything checkpoints the reference
downloads (``CGAug/download.py:7``): ``image_encoder.*`` (ViT-det),
``prompt_encoder.*``, ``mask_decoder.*``. Box-prompt path only — the mask-input
downscaling CNN (``prompt_encoder.mask_downscaling.*``) and the point/no-point
embeddings CG-Aug never exercises are skipped (recorded in ``skipped``).

Layouts: conv OIHW -> HWIO; ConvTranspose2d [in, out, kh, kw] -> flax
[kh, kw, in, out]; fused qkv [3C, C] -> DenseGeneral [C, 3, heads, d].
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..cgaug.sam import SAMConfig
from .torch2jax import _np


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _convT(w):
    """torch ConvTranspose2d [in, out, kh, kw] -> flax ConvTranspose(padding=
    "VALID") [kh, kw, in, out] with spatially flipped taps (lax.conv_transpose
    applies the kernel unflipped; verified exact in test_sam.py)."""
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()


def _dense(w):
    return np.transpose(w, (1, 0))


def convert_sam(state_dict, cfg: SAMConfig = SAMConfig()) -> Tuple[Dict, list]:
    """-> (flax params for :class:`cgaug.sam.SAM`, list of skipped torch keys)."""
    sd = _np(state_dict)
    used = set()

    def g(key):
        used.add(key)
        return sd[key]

    def dense(key, bias=True):
        out = {"kernel": _dense(g(key + ".weight"))}
        if bias:
            out["bias"] = g(key + ".bias")
        return out

    def ln(key):
        return {"scale": g(key + ".weight"), "bias": g(key + ".bias")}

    def ln2d(key):
        return {"weight": g(key + ".weight"), "bias": g(key + ".bias")}

    heads, width = cfg.heads, cfg.width
    d = width // heads

    enc: Dict = {
        "patch_embed": {"kernel": _conv(g("image_encoder.patch_embed.proj.weight")),
                        "bias": g("image_encoder.patch_embed.proj.bias")},
        "pos_embed": g("image_encoder.pos_embed"),
        "neck_conv1": {"kernel": _dense(
            g("image_encoder.neck.0.weight")[:, :, 0, 0])},
        "neck_ln1": ln2d("image_encoder.neck.1"),
        "neck_conv2": {"kernel": _conv(g("image_encoder.neck.2.weight"))},
        "neck_ln2": ln2d("image_encoder.neck.3"),
    }
    for i in range(cfg.depth):
        k = f"image_encoder.blocks.{i}"
        qkv_w = _dense(g(f"{k}.attn.qkv.weight")).reshape(width, 3, heads, d)
        qkv_b = g(f"{k}.attn.qkv.bias").reshape(3, heads, d)
        enc[f"block_{i}"] = {
            "norm1": ln(f"{k}.norm1"),
            "norm2": ln(f"{k}.norm2"),
            "attn": {
                "qkv": {"kernel": qkv_w, "bias": qkv_b},
                "proj": dense(f"{k}.attn.proj"),
                "rel_pos_h": g(f"{k}.attn.rel_pos_h"),
                "rel_pos_w": g(f"{k}.attn.rel_pos_w"),
            },
            "lin1": dense(f"{k}.mlp.lin1"),
            "lin2": dense(f"{k}.mlp.lin2"),
        }

    prompt = {
        "pe_gaussian": g("prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"),
        "point_embeddings": np.concatenate(
            [g(f"prompt_encoder.point_embeddings.{i}.weight") for i in range(4)]),
        "no_mask_embed": g("prompt_encoder.no_mask_embed.weight")[0],
    }

    def attn_block(key):
        return {p: dense(f"{key}.{p}")
                for p in ("q_proj", "k_proj", "v_proj", "out_proj")}

    dec: Dict = {
        "iou_token": g("mask_decoder.iou_token.weight"),
        "mask_tokens": g("mask_decoder.mask_tokens.weight"),
        "final_attn": attn_block("mask_decoder.transformer.final_attn_token_to_image"),
        "norm_final": ln("mask_decoder.transformer.norm_final_attn"),
        "upscale_conv1": {
            "kernel": _convT(g("mask_decoder.output_upscaling.0.weight")),
            "bias": g("mask_decoder.output_upscaling.0.bias")},
        "upscale_ln": ln2d("mask_decoder.output_upscaling.1"),
        "upscale_conv2": {
            "kernel": _convT(g("mask_decoder.output_upscaling.3.weight")),
            "bias": g("mask_decoder.output_upscaling.3.bias")},
    }
    for i in range(2):
        k = f"mask_decoder.transformer.layers.{i}"
        dec[f"layer_{i}"] = {
            "self_attn": attn_block(f"{k}.self_attn"),
            "cross_attn_token_to_image": attn_block(f"{k}.cross_attn_token_to_image"),
            "cross_attn_image_to_token": attn_block(f"{k}.cross_attn_image_to_token"),
            "norm1": ln(f"{k}.norm1"), "norm2": ln(f"{k}.norm2"),
            "norm3": ln(f"{k}.norm3"), "norm4": ln(f"{k}.norm4"),
            "mlp_lin1": dense(f"{k}.mlp.lin1"),
            "mlp_lin2": dense(f"{k}.mlp.lin2"),
        }
    for i in range(cfg.num_multimask + 1):
        dec[f"hyper_{i}"] = {
            f"lin_{j}": dense(f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}")
            for j in range(3)}
    dec["iou_head"] = {f"lin_{j}": dense(f"mask_decoder.iou_prediction_head.layers.{j}")
                       for j in range(3)}

    skipped = sorted(set(sd) - used)
    return ({"image_encoder": enc, "prompt_encoder": prompt,
             "mask_decoder": dec}, skipped)


def load_sam(path: str, cfg: SAMConfig = SAMConfig()):
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    params, _ = convert_sam(raw, cfg)
    return params


def sam_state_dict_template(cfg: SAMConfig = SAMConfig()) -> Dict[str, tuple]:
    """The exact key -> shape manifest of the public sam_vit_* checkpoints
    (box-prompt-relevant subset + the skipped mask/point keys), used by the
    converter-completeness test and as documentation of the expected layout."""
    w, hds, D = cfg.width, cfg.heads, cfg.embed_dim
    d = w // hds
    g = cfg.img_size // cfg.patch
    t: Dict[str, tuple] = {
        "image_encoder.patch_embed.proj.weight": (w, 3, cfg.patch, cfg.patch),
        "image_encoder.patch_embed.proj.bias": (w,),
        "image_encoder.pos_embed": (1, g, g, w),
        "image_encoder.neck.0.weight": (D, w, 1, 1),
        "image_encoder.neck.1.weight": (D,), "image_encoder.neck.1.bias": (D,),
        "image_encoder.neck.2.weight": (D, D, 3, 3),
        "image_encoder.neck.3.weight": (D,), "image_encoder.neck.3.bias": (D,),
    }
    for i in range(cfg.depth):
        k = f"image_encoder.blocks.{i}"
        grid = g if i in cfg.global_blocks else cfg.window
        t.update({
            f"{k}.norm1.weight": (w,), f"{k}.norm1.bias": (w,),
            f"{k}.attn.qkv.weight": (3 * w, w), f"{k}.attn.qkv.bias": (3 * w,),
            f"{k}.attn.proj.weight": (w, w), f"{k}.attn.proj.bias": (w,),
            f"{k}.attn.rel_pos_h": (2 * grid - 1, d),
            f"{k}.attn.rel_pos_w": (2 * grid - 1, d),
            f"{k}.norm2.weight": (w,), f"{k}.norm2.bias": (w,),
            f"{k}.mlp.lin1.weight": (4 * w, w), f"{k}.mlp.lin1.bias": (4 * w,),
            f"{k}.mlp.lin2.weight": (w, 4 * w), f"{k}.mlp.lin2.bias": (w,),
        })
    t.update({
        "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix": (2, D // 2),
        "prompt_encoder.not_a_point_embed.weight": (1, D),
        "prompt_encoder.no_mask_embed.weight": (1, D),
    })
    for i in range(4):
        t[f"prompt_encoder.point_embeddings.{i}.weight"] = (1, D)
    # mask-input CNN (skipped by the converter; box path never runs it)
    t.update({
        "prompt_encoder.mask_downscaling.0.weight": (D // 64, 1, 2, 2),
        "prompt_encoder.mask_downscaling.0.bias": (D // 64,),
        "prompt_encoder.mask_downscaling.1.weight": (D // 64,),
        "prompt_encoder.mask_downscaling.1.bias": (D // 64,),
        "prompt_encoder.mask_downscaling.3.weight": (D // 16, D // 64, 2, 2),
        "prompt_encoder.mask_downscaling.3.bias": (D // 16,),
        "prompt_encoder.mask_downscaling.4.weight": (D // 16,),
        "prompt_encoder.mask_downscaling.4.bias": (D // 16,),
        "prompt_encoder.mask_downscaling.6.weight": (D, D // 16, 1, 1),
        "prompt_encoder.mask_downscaling.6.bias": (D,),
    })
    nm = cfg.num_multimask + 1
    t.update({
        "mask_decoder.iou_token.weight": (1, D),
        "mask_decoder.mask_tokens.weight": (nm, D),
        "mask_decoder.transformer.norm_final_attn.weight": (D,),
        "mask_decoder.transformer.norm_final_attn.bias": (D,),
        "mask_decoder.output_upscaling.0.weight": (D, D // 4, 2, 2),
        "mask_decoder.output_upscaling.0.bias": (D // 4,),
        "mask_decoder.output_upscaling.1.weight": (D // 4,),
        "mask_decoder.output_upscaling.1.bias": (D // 4,),
        "mask_decoder.output_upscaling.3.weight": (D // 4, D // 8, 2, 2),
        "mask_decoder.output_upscaling.3.bias": (D // 8,),
    })

    def attn(key, ds):
        inner = D // ds
        t.update({f"{key}.q_proj.weight": (inner, D), f"{key}.q_proj.bias": (inner,),
                  f"{key}.k_proj.weight": (inner, D), f"{key}.k_proj.bias": (inner,),
                  f"{key}.v_proj.weight": (inner, D), f"{key}.v_proj.bias": (inner,),
                  f"{key}.out_proj.weight": (D, inner), f"{key}.out_proj.bias": (D,)})

    for i in range(2):
        k = f"mask_decoder.transformer.layers.{i}"
        attn(f"{k}.self_attn", 1)
        attn(f"{k}.cross_attn_token_to_image", cfg.decoder_downsample)
        attn(f"{k}.cross_attn_image_to_token", cfg.decoder_downsample)
        for n in ("norm1", "norm2", "norm3", "norm4"):
            t[f"{k}.{n}.weight"] = (D,)
            t[f"{k}.{n}.bias"] = (D,)
        t[f"{k}.mlp.lin1.weight"] = (8 * D, D)
        t[f"{k}.mlp.lin1.bias"] = (8 * D,)
        t[f"{k}.mlp.lin2.weight"] = (D, 8 * D)
        t[f"{k}.mlp.lin2.bias"] = (D,)
    attn("mask_decoder.transformer.final_attn_token_to_image", cfg.decoder_downsample)
    for i in range(nm):
        for j in range(3):
            out = D // 8 if j == 2 else D
            t[f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}.weight"] = (out, D)
            t[f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}.bias"] = (out,)
    for j in range(3):
        out = nm if j == 2 else D
        t[f"mask_decoder.iou_prediction_head.layers.{j}.weight"] = (out, D)
        t[f"mask_decoder.iou_prediction_head.layers.{j}.bias"] = (out,)
    return t
