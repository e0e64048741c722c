"""Stable-Diffusion-1.5 UNet + ControlNet branch, TPU-first.

This is the weight-reuse path for the reference's CG-Aug generator: the
``control_sd15_seg.pth`` checkpoint (seg-conditioned ControlNet over SD 1.5,
``CGAug/generate_multishift_image.py:44-46``) can be converted by
``convert/sd_controlnet.py`` onto these modules and sampled with
``cgaug/sd_pipeline.py``, reproducing the reference's generation quality on TPU.

Behavioral spec re-derived from the vendored torch stack (NOT a translation):

* UNet: ``CGAug/ControlNet/ldm/modules/diffusionmodules/openaimodel.py:412-786``
  (``UNetModel``) and the control-injecting variant ``cldm/cldm.py:21-46``
  (``ControlledUnetModel``) — residual blocks with timestep FiLM-add, spatial
  transformers (self + cross attention over the text context) at downsample
  rates 1/2/4, conv down/upsampling, skip concat; control residuals are added
  to the middle output and to each skip.
* ControlNet branch: ``cldm/cldm.py:48-305`` — a copy of the UNet encoder with
  an 8x-downsampling hint CNN and zero-initialized 1x1 projections per tap.

TPU-first choices: NHWC layout (MXU-native convs), 1x1 convs as Dense (lane
matmuls), attention logits in fp32 with bf16-friendly operands, group norms
computed in fp32 (the reference's ``GroupNorm32`` semantics), optional per-block
remat for training. All shapes static; the module is a pure function of params.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class SDUNetConfig:
    """Architecture knobs of ``UNetModel`` (openaimodel.py:442-472) that the
    SD1.5 / ControlNet-v15 family uses (models/cldm_v15.yaml)."""

    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    # downsample rates at which a SpatialTransformer follows each ResBlock
    attention_ds: Tuple[int, ...] = (1, 2, 4)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 768
    # ControlNet-only
    hint_channels: int = 3
    hint_widths: Tuple[int, ...] = (16, 16, 32, 32, 96, 96, 256)
    dtype: jnp.dtype = jnp.float32
    remat: bool = False


def tiny_sd_config(**over) -> SDUNetConfig:
    """A GroupNorm(32)-compatible miniature for tests."""
    kw = dict(
        model_channels=32,
        num_res_blocks=1,
        channel_mult=(1, 2),
        attention_ds=(1, 2),
        num_heads=4,
        context_dim=16,
        hint_widths=(8, 8, 16, 16, 24, 24, 32),
    )
    kw.update(over)
    return SDUNetConfig(**kw)


def unet_layout(cfg: SDUNetConfig):
    """Walk the UNetModel constructor loops (openaimodel.py:542-730) and emit
    the block list shared by the flax module and the checkpoint converter.

    Returns (input_specs, middle_ch, output_specs, skip_channels) where each
    input spec is a dict {i, kind, ch_in, ch_out, st, ds} keyed by the torch
    ``input_blocks`` index, and each output spec additionally carries the skip
    width and whether an upsample trails the block.
    """
    M = cfg.model_channels
    inputs = [dict(i=0, kind="conv", ch_in=cfg.in_channels, ch_out=M, st=False, ds=1)]
    skip_ch = [M]
    ch, ds, i = M, 1, 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            inputs.append(dict(i=i, kind="res", ch_in=ch, ch_out=mult * M,
                               st=ds in cfg.attention_ds, ds=ds))
            ch = mult * M
            skip_ch.append(ch)
            i += 1
        if level != len(cfg.channel_mult) - 1:
            inputs.append(dict(i=i, kind="down", ch_in=ch, ch_out=ch, st=False, ds=ds))
            skip_ch.append(ch)
            ds *= 2
            i += 1
    mid_ch = ch
    outputs = []
    sc = list(skip_ch)
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for j in range(cfg.num_res_blocks + 1):
            ich = sc.pop()
            spec = dict(i=len(outputs), ch_in=ch + ich, ch_out=mult * M, skip=ich,
                        st=ds in cfg.attention_ds, up=False, ds=ds)
            ch = mult * M
            if level and j == cfg.num_res_blocks:
                spec["up"] = True
                ds //= 2
            outputs.append(spec)
    return inputs, mid_ch, outputs, skip_ch


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep embedding, cos|sin order (diffusionmodules/util.py:152-170)."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class GroupNorm32(nn.Module):
    """GroupNorm evaluated in fp32 then cast back (util.py GroupNorm32)."""

    groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, name="gn")(
            x.astype(jnp.float32))
        return h.astype(x.dtype)


def _conv3(ch: int, name: str, stride: int = 1, zero: bool = False):
    init = nn.initializers.zeros_init() if zero else nn.initializers.lecun_normal()
    return nn.Conv(ch, (3, 3), strides=(stride, stride), padding=((1, 1), (1, 1)),
                   kernel_init=init, name=name)


class ResBlock(nn.Module):
    """GN-SiLU-conv / +FiLM(t) / GN-SiLU-conv with skip (openaimodel.py:162-274;
    SD uses the additive-embedding path, not scale-shift)."""

    ch_out: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, emb):
        h = GroupNorm32(eps=self.eps, name="norm_in")(x)
        h = _conv3(self.ch_out, "conv_in")(nn.silu(h))
        e = nn.Dense(self.ch_out, name="emb")(nn.silu(emb)).astype(h.dtype)
        h = h + e[:, None, None, :]
        h = GroupNorm32(eps=self.eps, name="norm_out")(h)
        h = _conv3(self.ch_out, "conv_out", zero=True)(nn.silu(h))
        if x.shape[-1] != self.ch_out:
            x = nn.Dense(self.ch_out, name="skip")(x)
        return x + h


class CrossAttention(nn.Module):
    """Multi-head attention; self when context is None (attention.py:145-194).
    Logits and softmax in fp32 (the reference forces ATTN_PRECISION=fp32)."""

    heads: int
    dim_head: int
    out_dim: int

    @nn.compact
    def __call__(self, x, context=None):
        ctx = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, name="to_v")(ctx)
        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, m, self.heads, self.dim_head)
        v = v.reshape(b, m, self.heads, self.dim_head)
        sim = jnp.einsum("bnhd,bmhd->bhnm", q.astype(jnp.float32),
                         k.astype(jnp.float32)) * (self.dim_head ** -0.5)
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, inner)
        return nn.Dense(self.out_dim, name="to_out")(out)


class BasicTransformerBlock(nn.Module):
    """self-attn / cross-attn / GEGLU-FF, each pre-LN residual (attention.py:246-275)."""

    heads: int
    dim_head: int
    dim: int

    @nn.compact
    def __call__(self, x, context):
        # torch nn.LayerNorm eps (1e-5), not the flax default
        a = CrossAttention(self.heads, self.dim_head, self.dim, name="attn1")
        x = a(nn.LayerNorm(epsilon=1e-5, name="norm1")(x)) + x
        c = CrossAttention(self.heads, self.dim_head, self.dim, name="attn2")
        x = c(nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context) + x
        h = nn.Dense(self.dim * 8, name="ff_proj")(nn.LayerNorm(epsilon=1e-5, name="norm3")(x))
        val, gate = jnp.split(h, 2, axis=-1)
        h = val * nn.gelu(gate, approximate=False)
        x = nn.Dense(self.dim, name="ff_out")(h) + x
        return x


class SpatialTransformer(nn.Module):
    """1x1-projected token transformer over the spatial grid with residual
    (attention.py:278-340; conv projections, depth transformer blocks)."""

    heads: int
    depth: int

    @nn.compact
    def __call__(self, x, context):
        b, hh, ww, c = x.shape
        dim_head = c // self.heads
        h = GroupNorm32(eps=1e-6, name="norm")(x)
        h = nn.Dense(c, name="proj_in")(h).reshape(b, hh * ww, c)
        for d in range(self.depth):
            h = BasicTransformerBlock(self.heads, dim_head, c, name=f"block_{d}")(h, context)
        h = nn.Dense(c, kernel_init=nn.initializers.zeros_init(),
                     name="proj_out")(h).reshape(b, hh, ww, c)
        return x + h


class _InputStack(nn.Module):
    """The shared encoder walk of UNetModel/ControlNet input_blocks + middle."""

    cfg: SDUNetConfig

    def setup(self):
        cfg = self.cfg
        inputs, mid_ch, _, _ = unet_layout(cfg)
        blocks = []
        for s in inputs:
            if s["kind"] == "conv":
                blocks.append((_conv3(s["ch_out"], f"in_{s['i']}_conv"), None))
            elif s["kind"] == "down":
                blocks.append((_conv3(s["ch_out"], f"in_{s['i']}_down", stride=2), None))
            else:
                res = ResBlock(s["ch_out"], name=f"in_{s['i']}_res")
                st = (SpatialTransformer(cfg.num_heads, cfg.transformer_depth,
                                         name=f"in_{s['i']}_st") if s["st"] else None)
                blocks.append((res, st))
        self.blocks = blocks
        self.specs = inputs
        self.mid_res1 = ResBlock(mid_ch, name="mid_res1")
        self.mid_st = SpatialTransformer(cfg.num_heads, cfg.transformer_depth, name="mid_st")
        self.mid_res2 = ResBlock(mid_ch, name="mid_res2")

    def __call__(self, x, emb, context, hint=None):
        hs = []
        h = x
        for spec, (blk, st) in zip(self.specs, self.blocks):
            if spec["kind"] in ("conv", "down"):
                h = blk(h)
            else:
                h = blk(h, emb)
                if st is not None:
                    h = st(h, context)
            if spec["i"] == 0 and hint is not None:
                h = h + hint
            hs.append(h)
        h = self.mid_res1(h, emb)
        h = self.mid_st(h, context)
        h = self.mid_res2(h, emb)
        return hs, h


class SDUNet(nn.Module):
    """The denoiser ``eps = f(x_t, t, context[, control])``; control is the
    13-tensor residual list from :class:`ControlNetBranch`
    (ControlledUnetModel, cldm.py:21-46)."""

    cfg: SDUNetConfig = SDUNetConfig()

    def setup(self):
        cfg = self.cfg
        _, _, outputs, _ = unet_layout(cfg)
        self.time_dense0 = nn.Dense(cfg.model_channels * 4, name="time_embed_0")
        self.time_dense1 = nn.Dense(cfg.model_channels * 4, name="time_embed_1")
        self.encoder = _InputStack(cfg, name="enc")
        blocks = []
        for s in outputs:
            res = ResBlock(s["ch_out"], name=f"out_{s['i']}_res")
            st = (SpatialTransformer(cfg.num_heads, cfg.transformer_depth,
                                     name=f"out_{s['i']}_st") if s["st"] else None)
            up = _conv3(s["ch_out"], f"out_{s['i']}_up") if s["up"] else None
            blocks.append((res, st, up))
        self.out_blocks = blocks
        self.out_specs = outputs
        self.out_norm = GroupNorm32(name="out_norm")
        self.out_conv = _conv3(cfg.out_channels, "out_conv", zero=True)

    def __call__(self, x, t, context, control: Optional[Sequence[jax.Array]] = None):
        cfg = self.cfg
        x = x.astype(cfg.dtype)
        emb = self.time_dense1(nn.silu(self.time_dense0(
            timestep_embedding(t, cfg.model_channels).astype(cfg.dtype))))
        hs, h = self.encoder(x, emb, context)
        if control is not None:
            h = h + control[-1]
        for idx, (spec, (res, st, up)) in enumerate(zip(self.out_specs, self.out_blocks)):
            skip = hs[-1 - idx]
            if control is not None:
                skip = skip + control[-2 - idx]
            h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
            h = res(h, emb)
            if st is not None:
                h = st(h, context)
            if up is not None:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                h = up(h)
        h = nn.silu(self.out_norm(h))
        return self.out_conv(h)


class ControlNetBranch(nn.Module):
    """Hint-conditioned encoder copy emitting the 13 zero-conv control taps
    (cldm.py:48-305): 12 input-block taps + the middle tap, in that order."""

    cfg: SDUNetConfig = SDUNetConfig()

    def setup(self):
        cfg = self.cfg
        inputs, mid_ch, _, _ = unet_layout(cfg)
        self.time_dense0 = nn.Dense(cfg.model_channels * 4, name="time_embed_0")
        self.time_dense1 = nn.Dense(cfg.model_channels * 4, name="time_embed_1")
        self.encoder = _InputStack(cfg, name="enc")
        hint = []
        strided = {2, 4, 6}  # hint conv indices with stride 2 (cldm.py:147-163)
        for j, w in enumerate(cfg.hint_widths):
            hint.append(_conv3(w, f"hint_{j}", stride=2 if j in strided else 1))
        self.hint_convs = hint
        self.hint_out = _conv3(cfg.model_channels, "hint_out", zero=True)
        self.zero_convs = [
            nn.Dense(s["ch_out"], kernel_init=nn.initializers.zeros_init(),
                     name=f"zero_{s['i']}") for s in inputs
        ]
        self.mid_out = nn.Dense(mid_ch, kernel_init=nn.initializers.zeros_init(),
                                name="zero_mid")

    def __call__(self, x, hint, t, context) -> List[jax.Array]:
        cfg = self.cfg
        x = x.astype(cfg.dtype)
        hint = hint.astype(cfg.dtype)
        emb = self.time_dense1(nn.silu(self.time_dense0(
            timestep_embedding(t, cfg.model_channels).astype(cfg.dtype))))
        g = hint
        for conv in self.hint_convs:
            g = nn.silu(conv(g))
        g = self.hint_out(g)
        hs, h = self.encoder(x, emb, context, hint=g)
        outs = [zc(hi) for zc, hi in zip(self.zero_convs, hs)]
        outs.append(self.mid_out(h))
        return outs
