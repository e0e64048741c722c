"""Segment Anything (SAM) in flax / NHWC — the CG-Aug filter's box-prompted
segmenter, able to consume the released ``sam_vit_h_4b8939.pth`` weights.

The reference filters generated images with SAM box prompts
(``CGAug/generate_multishift_image.py:56-58`` loads ``sam_model_registry["vit_h"]``
+ ``SamPredictor``; ``CGAug/generation_utils.py:295-333`` runs
``predict(box=bbox, multimask_output=False)`` and gates on IoU>0.7). The
``segment_anything`` package is not vendored there; this module re-implements
the published architecture (Kirillov et al., 2023; Apache-2.0
facebookresearch/segment-anything) TPU-first so the public checkpoint converts
via :func:`multishiftseg_tpu.convert.sam.convert_sam`:

* ViT-det image encoder: 16x16 patch embed, absolute + decomposed-relative
  position embeddings, 14x14 windowed attention with periodic global blocks,
  1x1+3x3 neck with channel LayerNorm -> [64, 64, 256] embeddings;
* prompt encoder: random-Fourier point PE; boxes as two corner points with
  learned corner embeddings; ``no_mask_embed`` dense embedding;
* mask decoder: two-way transformer (token<->image cross attention, 2 layers,
  downsampled attention dim), 4x transposed-conv upscaling, per-token
  hypernetwork MLPs, IoU prediction head.

TPU-first: everything is NHWC, jitted end-to-end with static 1024x1024 padded
shapes; windowed attention is one batched einsum over [B*windows, 196, C]
(static window count), not a Python loop. ``SamPredictor`` below mirrors the
reference predictor's resize-longest-side/normalize/pad preprocessing and its
mask upscale-crop-resize postprocessing, caching the image embedding between
prompts exactly like ``set_image``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    img_size: int = 1024
    patch: int = 16
    width: int = 1280
    depth: int = 32
    heads: int = 16
    global_blocks: Tuple[int, ...] = (7, 15, 23, 31)
    window: int = 14
    embed_dim: int = 256  # prompt/mask-decoder transformer dim
    decoder_heads: int = 8
    decoder_downsample: int = 2
    num_multimask: int = 3
    dtype: jnp.dtype = jnp.float32


def sam_vit_h() -> SAMConfig:
    return SAMConfig()


def sam_vit_l() -> SAMConfig:
    return SAMConfig(width=1024, depth=24, heads=16, global_blocks=(5, 11, 17, 23))


def sam_vit_b() -> SAMConfig:
    return SAMConfig(width=768, depth=12, heads=12, global_blocks=(2, 5, 8, 11))


def tiny_sam_config(**over) -> SAMConfig:
    kw = dict(img_size=64, width=16, depth=2, heads=2, global_blocks=(1,),
              window=2, embed_dim=16, decoder_heads=2)
    kw.update(over)
    return SAMConfig(**kw)


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm over NHWC features (SAM's LayerNorm2d)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones_init(), (c,))
        b = self.param("bias", nn.initializers.zeros_init(), (c,))
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
        y = (x32 - mu) / jnp.sqrt(var + self.eps)
        return (y * w + b).astype(x.dtype)


def window_partition(x: jax.Array, w: int):
    """[B, H, W, C] -> ([B*nw, w, w, C], padded (Hp, Wp)); zero right/bottom pad."""
    b, h, wd, c = x.shape
    ph, pw = (-h) % w, (-wd) % w
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, wd + pw
    x = x.reshape(b, hp // w, w, wp // w, w, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w, w, c), (hp, wp)


def window_unpartition(x: jax.Array, w: int, pad_hw, hw):
    hp, wp = pad_hw
    h, wd = hw
    b = x.shape[0] // ((hp // w) * (wp // w))
    x = x.reshape(b, hp // w, wp // w, w, w, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hp, wp, -1)[:, :h, :wd]


def _rel_coords(q: int, k: int) -> np.ndarray:
    """Index table into a (2*max(q,k)-1)-long relative embedding (equal q/k here)."""
    ratio_k = max(q / k, 1.0)
    ratio_q = max(k / q, 1.0)
    qs = np.arange(q)[:, None] * ratio_q
    ks = np.arange(k)[None, :] * ratio_k
    return (qs - ks + (k - 1) * ratio_k).astype(np.int32)


class ViTAttention(nn.Module):
    """qkv attention with decomposed relative positions added to the logits
    (attn += q.Rh + q.Rw), fp32 softmax."""

    heads: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        d = c // self.heads
        qkv = nn.DenseGeneral((3, self.heads, d), axis=-1, name="qkv")(x)
        q, k, v = jnp.moveaxis(qkv, 3, 0)
        # [B, h*w, heads, d]
        q = q.reshape(b, h * w, self.heads, d)
        kk = k.reshape(b, h * w, self.heads, d)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q.astype(jnp.float32),
                          kk.astype(jnp.float32)) * (d ** -0.5)
        max_rel = 2 * max(h, w) - 1
        rel_h = self.param("rel_pos_h", nn.initializers.zeros_init(), (max_rel, d))
        rel_w = self.param("rel_pos_w", nn.initializers.zeros_init(), (max_rel, d))
        rh = rel_h[jnp.asarray(_rel_coords(h, h))]       # [h, h, d]
        rw = rel_w[jnp.asarray(_rel_coords(w, w))]       # [w, w, d]
        qs = q.reshape(b, h, w, self.heads, d).astype(jnp.float32)
        add_h = jnp.einsum("bxyhd,xid->bhxyi", qs, rh.astype(jnp.float32))
        add_w = jnp.einsum("bxyhd,yjd->bhxyj", qs, rw.astype(jnp.float32))
        attn = attn.reshape(b, self.heads, h, w, h, w)
        attn = attn + add_h[:, :, :, :, :, None] + add_w[:, :, :, :, None, :]
        attn = attn.reshape(b, self.heads, h * w, h * w)
        p = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhnm,bmhd->bnhd", p, v.reshape(b, h * w, self.heads, d))
        o = o.reshape(b, h, w, c)
        return nn.Dense(c, name="proj")(o)


class ViTBlock(nn.Module):
    heads: int
    window: int  # 0 = global

    @nn.compact
    def __call__(self, x):
        h0, w0 = x.shape[1], x.shape[2]
        s = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window:
            s, pad_hw = window_partition(s, self.window)
        s = ViTAttention(self.heads, name="attn")(s)
        if self.window:
            s = window_unpartition(s, self.window, pad_hw, (h0, w0))
        x = x + s
        s = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        s = nn.Dense(4 * x.shape[-1], name="lin1")(s)
        s = nn.Dense(x.shape[-1], name="lin2")(nn.gelu(s, approximate=False))
        return x + s


class SAMImageEncoder(nn.Module):
    cfg: SAMConfig = SAMConfig()

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = x.astype(cfg.dtype)
        g = cfg.img_size // cfg.patch
        x = nn.Conv(cfg.width, (cfg.patch, cfg.patch),
                    strides=(cfg.patch, cfg.patch), padding="VALID",
                    name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.zeros_init(),
                         (1, g, g, cfg.width))
        x = x + pos.astype(x.dtype)
        for i in range(cfg.depth):
            win = 0 if i in cfg.global_blocks else cfg.window
            x = ViTBlock(cfg.heads, win, name=f"block_{i}")(x)
        x = nn.Dense(cfg.embed_dim, use_bias=False, name="neck_conv1")(x)
        x = LayerNorm2d(name="neck_ln1")(x)
        x = nn.Conv(cfg.embed_dim, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="neck_conv2")(x)
        x = LayerNorm2d(name="neck_ln2")(x)
        return x


# ---------------------------------------------------------------------------
# prompt encoder
# ---------------------------------------------------------------------------

class SAMPromptEncoder(nn.Module):
    """Box prompts only (the CG-Aug path) + the no-mask dense embedding."""

    cfg: SAMConfig = SAMConfig()

    @nn.compact
    def __call__(self, boxes_xyxy: Optional[jax.Array]):
        cfg = self.cfg
        g = cfg.img_size // cfg.patch
        gauss = self.param("pe_gaussian", nn.initializers.normal(1.0),
                           (2, cfg.embed_dim // 2))

        def _pe(coords01):
            """Random-Fourier positional encoding of [..., 2] coords in [0,1]."""
            c = (2.0 * coords01 - 1.0) @ gauss.astype(jnp.float32) * (2.0 * np.pi)
            return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)
        # learned embeddings: 0/1 = neg/pos points, 2/3 = box corners
        corner = self.param("point_embeddings", nn.initializers.normal(1.0),
                            (4, cfg.embed_dim))
        no_mask = self.param("no_mask_embed", nn.initializers.normal(1.0),
                             (cfg.embed_dim,))
        sparse = None
        if boxes_xyxy is not None:
            pts = (boxes_xyxy.reshape(-1, 2, 2) + 0.5) / cfg.img_size
            sparse = _pe(pts) + jnp.stack([corner[2], corner[3]])[None]
        ys = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        xs = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
        image_pe = _pe(grid)  # [g, g, D]
        dense = jnp.broadcast_to(no_mask, (1, g, g, cfg.embed_dim))
        return sparse, dense, image_pe


# ---------------------------------------------------------------------------
# two-way transformer mask decoder
# ---------------------------------------------------------------------------

class _DecoderAttention(nn.Module):
    heads: int
    internal_dim: int

    @nn.compact
    def __call__(self, q, k, v):
        d = self.internal_dim // self.heads
        qq = nn.Dense(self.internal_dim, name="q_proj")(q)
        kk = nn.Dense(self.internal_dim, name="k_proj")(k)
        vv = nn.Dense(self.internal_dim, name="v_proj")(v)
        b = q.shape[0]
        qq = qq.reshape(b, -1, self.heads, d)
        kk = kk.reshape(b, -1, self.heads, d)
        vv = vv.reshape(b, -1, self.heads, d)
        sim = jnp.einsum("bnhd,bmhd->bhnm", qq.astype(jnp.float32),
                         kk.astype(jnp.float32)) / np.sqrt(d)
        p = jax.nn.softmax(sim, axis=-1).astype(vv.dtype)
        o = jnp.einsum("bhnm,bmhd->bnhd", p, vv).reshape(b, -1, self.internal_dim)
        return nn.Dense(q.shape[-1], name="out_proj")(o)


class _TwoWayBlock(nn.Module):
    cfg: SAMConfig
    skip_first_pe: bool

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        cfg = self.cfg
        dim, ds = cfg.embed_dim, cfg.decoder_downsample
        if self.skip_first_pe:
            # segment_anything TwoWayAttentionBlock: the skip_first_layer_pe
            # branch REPLACES queries with the attention output (no residual)
            queries = _DecoderAttention(cfg.decoder_heads, dim, name="self_attn")(
                queries, queries, queries)
        else:
            qpe = queries + query_pe
            q = _DecoderAttention(cfg.decoder_heads, dim, name="self_attn")(
                qpe, qpe, queries)
            queries = queries + q
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1")(queries)
        a = _DecoderAttention(cfg.decoder_heads, dim // ds,
                              name="cross_attn_token_to_image")(
            queries + query_pe, keys + key_pe, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2")(queries + a)
        m = nn.Dense(dim * 8, name="mlp_lin1")(queries)
        m = nn.Dense(dim, name="mlp_lin2")(nn.relu(m))
        queries = nn.LayerNorm(epsilon=1e-5, name="norm3")(queries + m)
        a = _DecoderAttention(cfg.decoder_heads, dim // ds,
                              name="cross_attn_image_to_token")(
            keys + key_pe, queries + query_pe, queries)
        keys = nn.LayerNorm(epsilon=1e-5, name="norm4")(keys + a)
        return queries, keys


class _MLP(nn.Module):
    hidden: int
    out: int
    layers: int = 3
    sigmoid_out: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, name=f"lin_{i}")(x))
        x = nn.Dense(self.out, name=f"lin_{self.layers - 1}")(x)
        return jax.nn.sigmoid(x) if self.sigmoid_out else x


class SAMMaskDecoder(nn.Module):
    cfg: SAMConfig = SAMConfig()

    @nn.compact
    def __call__(self, image_embed, image_pe, sparse_prompt, dense_prompt):
        """-> (masks [B, 1+M, 4g, 4g] low-res logits, iou_pred [B, 1+M])."""
        cfg = self.cfg
        dim = cfg.embed_dim
        nm = cfg.num_multimask + 1
        iou_tok = self.param("iou_token", nn.initializers.normal(1.0), (1, dim))
        mask_tok = self.param("mask_tokens", nn.initializers.normal(1.0), (nm, dim))
        b = sparse_prompt.shape[0]
        toks = jnp.concatenate([iou_tok, mask_tok], axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(toks[None], (b, nm + 1, dim)), sparse_prompt], axis=1)

        src = image_embed + dense_prompt
        g = src.shape[1]
        keys = jnp.broadcast_to(src, (b,) + src.shape[1:]).reshape(b, g * g, dim)
        key_pe = jnp.broadcast_to(image_pe.reshape(1, g * g, dim),
                                  (b, g * g, dim)).astype(keys.dtype)
        queries = tokens
        for i in range(2):
            queries, keys = _TwoWayBlock(cfg, skip_first_pe=(i == 0),
                                         name=f"layer_{i}")(queries, keys,
                                                            tokens, key_pe)
        a = _DecoderAttention(cfg.decoder_heads, dim // cfg.decoder_downsample,
                              name="final_attn")(queries + tokens,
                                                 keys + key_pe, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm_final")(queries + a)

        iou_out = queries[:, 0]
        mask_out = queries[:, 1:1 + nm]
        img = keys.reshape(b, g, g, dim)
        img = nn.ConvTranspose(dim // 4, (2, 2), strides=(2, 2), padding="VALID",
                               name="upscale_conv1")(img)
        img = nn.gelu(LayerNorm2d(name="upscale_ln")(img), approximate=False)
        img = nn.ConvTranspose(dim // 8, (2, 2), strides=(2, 2), padding="VALID",
                               name="upscale_conv2")(img)
        img = nn.gelu(img, approximate=False)
        hyper = jnp.stack(
            [_MLP(dim, dim // 8, name=f"hyper_{i}")(mask_out[:, i])
             for i in range(nm)], axis=1)  # [B, nm, dim/8]
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper, img)
        iou_pred = _MLP(dim, nm, name="iou_head")(iou_out)
        return masks, iou_pred


class SAM(nn.Module):
    """Box-prompted segmentation: full 1024-padded image -> low-res mask logits."""

    cfg: SAMConfig = SAMConfig()

    def setup(self):
        self.image_encoder = SAMImageEncoder(self.cfg, name="image_encoder")
        self.prompt_encoder = SAMPromptEncoder(self.cfg, name="prompt_encoder")
        self.mask_decoder = SAMMaskDecoder(self.cfg, name="mask_decoder")

    def encode_image(self, x):
        return self.image_encoder(x)

    def decode_box(self, image_embed, boxes_xyxy):
        sparse, dense, image_pe = self.prompt_encoder(boxes_xyxy)
        return self.mask_decoder(image_embed, image_pe, sparse, dense)

    def __call__(self, x, boxes_xyxy):
        return self.decode_box(self.encode_image(x), boxes_xyxy)


# ---------------------------------------------------------------------------
# predictor (the SamPredictor surface CG-Aug uses)
# ---------------------------------------------------------------------------

PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)
MASK_THRESHOLD = 0.0


class SamPredictor:
    """set_image caches the ViT embedding; predict(box=...) returns binary masks
    at the original resolution (mirrors segment_anything.SamPredictor for the
    box/multimask_output=False path CG-Aug uses)."""

    def __init__(self, params, cfg: SAMConfig = SAMConfig()):
        self.cfg = cfg
        self.model = SAM(cfg)
        self.params = params
        self._embed = None
        self._orig_hw = None
        self._input_hw = None
        self._encode = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x,
                                          method=SAM.encode_image))
        self._decode = jax.jit(
            lambda p, e, bx: self.model.apply({"params": p}, e, bx,
                                              method=SAM.decode_box))

    def _scale(self, h, w):
        return self.cfg.img_size / max(h, w)

    def set_image(self, image: np.ndarray):
        h, w = image.shape[:2]
        s = self._scale(h, w)
        nh, nw = int(h * s + 0.5), int(w * s + 0.5)
        x = jax.image.resize(jnp.asarray(image, jnp.float32), (nh, nw, 3),
                             "bilinear")
        x = (x - PIXEL_MEAN) / PIXEL_STD
        x = jnp.pad(x, ((0, self.cfg.img_size - nh), (0, self.cfg.img_size - nw),
                        (0, 0)))
        self._embed = self._encode(self.params, x[None])
        self._orig_hw = (h, w)
        self._input_hw = (nh, nw)

    def predict(self, point_coords=None, point_labels=None, box=None,
                multimask_output: bool = False):
        assert self._embed is not None, "call set_image first"
        assert box is not None, "box prompts only (the CG-Aug path)"
        h, w = self._orig_hw
        s = self._scale(h, w)
        boxes = jnp.asarray(np.asarray(box, np.float32).reshape(-1, 4) * s)
        masks, iou = self._decode(self.params, self._embed, boxes)
        sl = slice(0, 1) if not multimask_output else slice(1, None)
        masks = masks[:, sl]
        iou = np.asarray(iou[:, sl])
        b, m = masks.shape[:2]
        full = jax.image.resize(masks, (b, m, self.cfg.img_size, self.cfg.img_size),
                                "bilinear")
        full = full[:, :, : self._input_hw[0], : self._input_hw[1]]
        full = jax.image.resize(full, (b, m, h, w), "bilinear")
        out = np.asarray(full > MASK_THRESHOLD)
        low = np.asarray(masks)
        if np.asarray(box).ndim == 1 or np.asarray(box).shape[0] == 1:
            return out[0], iou[0], low[0]
        return out, iou, low


class SAMSegmenter:
    """:class:`cgaug.generate.PromptableSegmenter` over real SAM weights."""

    def __init__(self, params, cfg: SAMConfig = SAMConfig()):
        self.predictor = SamPredictor(params, cfg)

    def segment_box(self, image: np.ndarray, box_xyxy: np.ndarray) -> np.ndarray:
        self.predictor.set_image(image)
        masks, _, _ = self.predictor.predict(box=np.asarray(box_xyxy),
                                             multimask_output=False)
        return masks[0].astype(bool)
