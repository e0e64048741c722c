"""AutoencoderKL (the SD first stage) in flax / NHWC.

Behavioral spec from the vendored torch stack
(``CGAug/ControlNet/ldm/modules/diffusionmodules/model.py:452-652`` Encoder /
Decoder; ``ldm/models/autoencoder.py`` AutoencoderKL): pre-activation resnet
blocks (GroupNorm eps 1e-6, swish), a single-head attention block at the
bottleneck, conv downsampling with asymmetric (0,1) padding, nearest-2x conv
upsampling, and 1x1 quant/post-quant projections around the diagonal-Gaussian
latent. SD1.5 config (models/cldm_v15.yaml first_stage_config): ch=128,
ch_mult=(1,2,4,4), 2 res blocks, z=4, double_z, no down-path attention.

CG-Aug generation only needs ``decode`` (generate_multishift_image.py:136), but
``encode`` is included for latent-space training / img2img parity.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    in_channels: int = 3
    out_ch: int = 3
    z_channels: int = 4
    embed_dim: int = 4
    double_z: bool = True
    attn_resolutions: Tuple[int, ...] = ()
    resolution: int = 256
    dtype: jnp.dtype = jnp.float32


def tiny_vae_config(**over) -> VAEConfig:
    kw = dict(ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=32)
    kw.update(over)
    return VAEConfig(**kw)


def _norm(name: str):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, name=name)


def _conv3(ch: int, name: str):
    return nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), name=name)


class VAEResBlock(nn.Module):
    """norm-swish-conv twice with learned 1x1 shortcut on width change
    (model.py:88-122; temb_channels=0 in the autoencoder)."""

    ch_out: int

    @nn.compact
    def __call__(self, x):
        h = _conv3(self.ch_out, "conv1")(nn.swish(_norm("norm1")(x)))
        h = _conv3(self.ch_out, "conv2")(nn.swish(_norm("norm2")(h)))
        if x.shape[-1] != self.ch_out:
            x = nn.Dense(self.ch_out, name="shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head spatial self-attention with 1x1 projections (model.py:144-190)."""

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = _norm("norm")(x)
        q = nn.Dense(c, name="q")(h).reshape(b, hh * ww, c)
        k = nn.Dense(c, name="k")(h).reshape(b, hh * ww, c)
        v = nn.Dense(c, name="v")(h).reshape(b, hh * ww, c)
        w = jnp.einsum("bnc,bmc->bnm", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * (c ** -0.5)
        w = jax.nn.softmax(w, axis=-1).astype(v.dtype)
        h = jnp.einsum("bnm,bmc->bnc", w, v).reshape(b, hh, ww, c)
        return x + nn.Dense(c, name="proj_out")(h)


class VAEEncoder(nn.Module):
    """model.py:452-543 — per-level res blocks, strided-conv downsampling with
    (0,1) asymmetric padding, mid res-attn-res, GN-swish-conv head."""

    cfg: VAEConfig = VAEConfig()

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = x.astype(cfg.dtype)
        h = _conv3(cfg.ch, "conv_in")(x)
        res = cfg.resolution
        for level, mult in enumerate(cfg.ch_mult):
            for b in range(cfg.num_res_blocks):
                h = VAEResBlock(cfg.ch * mult, name=f"down_{level}_block_{b}")(h)
                if res in cfg.attn_resolutions:
                    h = VAEAttnBlock(name=f"down_{level}_attn_{b}")(h)
            if level != len(cfg.ch_mult) - 1:
                h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2),
                            padding=((0, 1), (0, 1)),
                            name=f"down_{level}_downsample")(h)
                res //= 2
        h = VAEResBlock(h.shape[-1], name="mid_block_1")(h)
        h = VAEAttnBlock(name="mid_attn_1")(h)
        h = VAEResBlock(h.shape[-1], name="mid_block_2")(h)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return _conv3(out_ch, "conv_out")(nn.swish(_norm("norm_out")(h)))


class VAEDecoder(nn.Module):
    """model.py:546-652 — conv_in at the bottleneck width, mid res-attn-res,
    (num_res_blocks+1) blocks per level with nearest-2x conv upsampling."""

    cfg: VAEConfig = VAEConfig()

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        z = z.astype(cfg.dtype)
        levels = len(cfg.ch_mult)
        block_in = cfg.ch * cfg.ch_mult[-1]
        res = cfg.resolution // 2 ** (levels - 1)
        h = _conv3(block_in, "conv_in")(z)
        h = VAEResBlock(block_in, name="mid_block_1")(h)
        h = VAEAttnBlock(name="mid_attn_1")(h)
        h = VAEResBlock(block_in, name="mid_block_2")(h)
        for level in reversed(range(levels)):
            for b in range(cfg.num_res_blocks + 1):
                h = VAEResBlock(cfg.ch * cfg.ch_mult[level], name=f"up_{level}_block_{b}")(h)
                if res in cfg.attn_resolutions:
                    h = VAEAttnBlock(name=f"up_{level}_attn_{b}")(h)
            if level != 0:
                b_, hh, ww, c_ = h.shape
                h = jax.image.resize(h, (b_, hh * 2, ww * 2, c_), "nearest")
                h = _conv3(c_, f"up_{level}_upsample")(h)
                res *= 2
        return _conv3(cfg.out_ch, "conv_out")(nn.swish(_norm("norm_out")(h)))


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar) via the 1x1 quant conv; decode via the 1x1
    post-quant conv (autoencoder.py AutoencoderKL.{encode,decode})."""

    cfg: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = VAEEncoder(self.cfg, name="encoder")
        self.decoder = VAEDecoder(self.cfg, name="decoder")
        self.quant = nn.Dense(2 * self.cfg.embed_dim, name="quant_conv")
        self.post_quant = nn.Dense(self.cfg.z_channels, name="post_quant_conv")

    def encode(self, x):
        moments = self.quant(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant(z))

    def __call__(self, x, rng=None):
        mean, logvar = self.encode(x)
        z = mean if rng is None else mean + jnp.exp(0.5 * logvar) * (
            jax.random.normal(rng, mean.shape, mean.dtype))
        return self.decode(z), mean, logvar
