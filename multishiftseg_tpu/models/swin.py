"""Swin Transformer backbone (windowed attention, shifted windows, patch merging).

Behavioural port of the reference's backbone (``modeling/backbone/swin.py:21-770``,
timm-free torch), exposing res2..res5 feature maps with per-stage output norms like the
``D2SwinTransformer`` wrapper. Selected by the swin experiment yamls
(``configs/.../swin/*.yaml``); the shipped anomaly model uses ResNet-50, so this is the
scale-up path.

TPU notes: window partitioning is pure reshape/transpose (free under XLA); the shifted
-window attention mask and relative-position index are static per (H, W) and built
host-side; attention itself is batched einsum on the MXU.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

SWIN_CONFIGS = {
    "tiny": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24), window_size=7),
    "small": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24), window_size=7),
    "base": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), window_size=12),
    "large": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48), window_size=12),
}


@functools.lru_cache(maxsize=32)
def _relative_position_index(ws: int) -> np.ndarray:
    """[ws^2, ws^2] index into the (2ws-1)^2 relative-position bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, n, n]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


@functools.lru_cache(maxsize=128)
def _shift_attn_mask(hp: int, wp: int, ws: int, shift: int) -> Optional[np.ndarray]:
    """[num_windows, ws^2, ws^2] additive mask (−100 blocked / 0 allowed) for shifted
    windows; None when no shift."""
    if shift == 0:
        return None
    img = np.zeros((hp, wp))
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[h, w] = cnt
            cnt += 1
    win = img.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, attn_mask):  # x: [B_windows, ws*ws, C]
        n, l, c = x.shape
        h = self.num_heads
        d = c // h
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(n, l, 3, h, d).transpose(2, 0, 3, 1, 4), 3)
        q, k, v = q[0], k[0], v[0]  # [n, h, l, d]
        logits = jnp.einsum("nhqd,nhkd->nhqk", q * (d**-0.5), k).astype(jnp.float32)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, h),
        )
        idx = jnp.asarray(_relative_position_index(self.window_size)).reshape(-1)
        bias = table[idx].reshape(l, l, h).transpose(2, 0, 1)
        logits = logits + bias[None].astype(jnp.float32)
        if attn_mask is not None:
            nw = attn_mask.shape[0]
            logits = logits.reshape(n // nw, nw, h, l, l) + attn_mask[None, :, None]
            logits = logits.reshape(n, h, l, l)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("nhqk,nhkd->nhqd", probs, v).transpose(0, 2, 1, 3).reshape(n, l, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


def drop_path(x, rate: float, rng) -> jax.Array:
    """Per-sample stochastic depth (timm ``DropPath``, used by the reference swin
    blocks at drop_path_rate 0.3 via the swin yamls): keep with prob 1-rate and
    rescale, dropping the whole residual branch for dropped samples."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask.astype(x.dtype) / keep


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):  # [N, H, W, C]
        n, h, w, c = x.shape
        # The reference keeps the configured window size and shift on every map and
        # pads up to window multiples, even when H or W < window (swin.py:250-259,
        # 406-430) — do not shrink/disable, it changes the numerics.
        ws = self.window_size
        shift = self.shift_size

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        ph = (-h) % ws
        pw = (-w) % ws
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, w + pw
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        # window partition: [N * nW, ws*ws, C]
        xw = x.reshape(n, hp // ws, ws, wp // ws, ws, c)
        xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
        mask_np = _shift_attn_mask(hp, wp, ws, shift)
        mask = None if mask_np is None else jnp.asarray(mask_np)
        xw = WindowAttention(self.dim, self.num_heads, ws, dtype=self.dtype,
                             name="attn")(xw, mask)
        x = xw.reshape(n, hp // ws, wp // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(n, hp, wp, c)
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :h, :w]
        use_dp = train and self.drop_path_rate > 0.0
        if use_dp:
            x = drop_path(x, self.drop_path_rate, self.make_rng("dropout"))
        x = shortcut + x

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        # exact (erf) GELU — torch nn.GELU default; the tanh approximation drifts
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(nn.gelu(y, approximate=False))
        if use_dp:
            y = drop_path(y, self.drop_path_rate, self.make_rng("dropout"))
        return x + y


class PatchMerging(nn.Module):
    dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):  # [N, H, W, C] -> [N, H/2, W/2, 2C]
        n, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    # reference MODEL.SWIN.DROP_PATH_RATE (config.py:86, swin yamls: 0.3), applied
    # as a linspace schedule over all blocks like the torch swin (swin.py:580-584)
    drop_path_rate: float = 0.3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        # patch embed: conv 4x4 stride 4 + LN
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)

        feats = {}
        dim = self.embed_dim
        total = sum(self.depths)
        dpr = np.linspace(0.0, self.drop_path_rate, total)
        done = 0
        for stage, depth in enumerate(self.depths):
            for blk in range(depth):
                x = SwinBlock(
                    dim=dim, num_heads=self.num_heads[stage],
                    window_size=self.window_size,
                    shift_size=0 if blk % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path_rate=float(dpr[done + blk]), dtype=self.dtype,
                    name=f"stage{stage}_block{blk}",
                )(x, train=train)
            done += depth
            # per-stage output norm (the D2 wrapper's norm0..norm3, swin.py:686-764)
            feats[f"res{stage + 2}"] = nn.LayerNorm(epsilon=1e-5, 
                dtype=self.dtype, name=f"out_norm{stage}"
            )(x)
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim=dim, dtype=self.dtype, name=f"downsample{stage}")(x)
                dim *= 2
        return feats


SWIN_FEATURE_CHANNELS = {
    name: {f"res{i + 2}": cfg["embed_dim"] * (2**i) for i in range(4)}
    for name, cfg in SWIN_CONFIGS.items()
}
