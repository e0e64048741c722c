"""Seg-conditioned diffusion backend for CG-Aug — fills the ``DiffusionBackend``
protocol slot with a real, trainable JAX model.

The reference synthesizes images with a vendored ControlNet/LDM stack (~59k LoC;
seg-conditioned DDIM sampling at ``CGAug/generate_multishift_image.py:107-137``: 50
steps, unconditional-guidance scale 9.0, prompt = dashcam template + anomaly phrase).
That stack exists to reuse StableDiffusion weights; the *role* it plays in CG-Aug is
"label map + text prompt -> street image". This module implements that role TPU-first:

* a pixel-space UNet (no VAE/CLIP dependencies) conditioned on
  - the ADE20K-palette label map, concatenated as input channels (the ControlNet
    conditioning signal), and
  - a prompt embedding (hashed bag-of-words table + FiLM), standing in for CLIP text
    conditioning;
* DDPM epsilon-prediction training (linear beta schedule) with classifier-free
  dropout of the prompt, and a DDIM sampler with unconditional guidance — the exact
  sampling interface of the reference (``steps=50``, ``cfg_scale=9.0`` defaults);
* everything jitted with static shapes; the sampler is a ``lax.fori_loop`` so the 50
  steps compile to one XLA program; cond/uncond passes run as one batch of 2.

``JaxSegDiffusion`` implements ``DiffusionBackend.generate`` for
:class:`multishiftseg_tpu.cgaug.generate.MultiShiftGenerator`. Weights come from
``train_step`` runs on (image, color-label) pairs — e.g. Cityscapes train — via any
of this package's loaders.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

PROMPT_VOCAB = 1024
PROMPT_DIM = 128


def hash_prompt(prompt: str, vocab: int = PROMPT_VOCAB, max_tokens: int = 32) -> np.ndarray:
    """Deterministic token-id encoding: FNV-1a hash of each word into [1, vocab);
    0 is the null/pad id (also the classifier-free unconditional prompt)."""
    ids = np.zeros(max_tokens, np.int32)
    for i, tok in enumerate(prompt.lower().split()[:max_tokens]):
        h = np.uint64(14695981039346656037)
        for ch in tok.encode():
            h = np.uint64((int(h) ^ ch) * 1099511628211 % (1 << 64))
        ids[i] = int(h % np.uint64(vocab - 1)) + 1
    return ids


def timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal embedding of (possibly fractional) timesteps, [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ResBlock(nn.Module):
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, emb):
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype)(x)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype)(nn.silu(h))
        # FiLM: scale/shift from the time+prompt embedding
        film = nn.Dense(2 * self.features, dtype=self.dtype)(nn.silu(emb))
        scale, shift = jnp.split(film[:, None, None, :], 2, axis=-1)
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype)(h)
        h = h * (1 + scale) + shift
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype)(nn.silu(h))
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), dtype=self.dtype)(x)
        return x + h


class SegCondUNet(nn.Module):
    """Epsilon-prediction UNet over [x_t ‖ seg_cond] with FiLM time/prompt injection."""

    base: int = 64
    mults: Sequence[int] = (1, 2, 4)
    blocks_per_level: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_t, seg_cond, t, prompt_ids):
        """x_t [B,H,W,3] noisy image; seg_cond [B,H,W,3] label RGB in [-1,1];
        t [B] int/float timesteps; prompt_ids [B, T] hashed token ids (0 = pad)."""
        table = self.param(
            "prompt_table", nn.initializers.normal(0.02), (PROMPT_VOCAB, PROMPT_DIM)
        )
        tok = table[prompt_ids]  # [B, T, D]
        denom = jnp.maximum((prompt_ids > 0).sum(-1, keepdims=True), 1)
        prompt_emb = (tok * (prompt_ids > 0)[..., None]).sum(1) / denom
        emb = timestep_embedding(t, PROMPT_DIM)
        emb = nn.Dense(4 * self.base, dtype=self.dtype)(
            jnp.concatenate([emb, prompt_emb], -1)
        )
        emb = nn.Dense(4 * self.base, dtype=self.dtype)(nn.silu(emb))

        h = nn.Conv(self.base, (3, 3), dtype=self.dtype)(
            jnp.concatenate([x_t, seg_cond], -1)
        )
        skips = [h]
        for li, m in enumerate(self.mults):
            for _ in range(self.blocks_per_level):
                h = ResBlock(self.base * m, dtype=self.dtype)(h, emb)
                skips.append(h)
            if li < len(self.mults) - 1:
                h = nn.Conv(self.base * m, (3, 3), strides=(2, 2), dtype=self.dtype)(h)
                skips.append(h)
        h = ResBlock(self.base * self.mults[-1], dtype=self.dtype)(h, emb)
        for li, m in reversed(list(enumerate(self.mults))):
            for _ in range(self.blocks_per_level + 1):
                h = jnp.concatenate([h, skips.pop()], -1)
                h = ResBlock(self.base * m, dtype=self.dtype)(h, emb)
            if li > 0:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                h = nn.Conv(c, (3, 3), dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype)(h)
        return nn.Conv(3, (3, 3), dtype=self.dtype,
                       kernel_init=nn.initializers.zeros)(nn.silu(h))


@dataclass(frozen=True)
class NoiseSchedule:
    """Linear DDPM beta schedule (the ControlNet/LDM default, 1e-4..2e-2, T=1000)."""

    num_steps: int = 1000
    beta_start: float = 1e-4
    beta_end: float = 2e-2

    @functools.cached_property
    def alpha_bar(self) -> np.ndarray:
        betas = np.linspace(self.beta_start, self.beta_end, self.num_steps, dtype=np.float64)
        return np.cumprod(1.0 - betas).astype(np.float32)


def ddpm_loss(model: SegCondUNet, params, rng, images, seg_cond, prompt_ids,
              schedule: NoiseSchedule = NoiseSchedule(), uncond_prob: float = 0.1):
    """Mean-squared epsilon-prediction loss with classifier-free prompt dropout.

    images/seg_cond in [-1, 1]; prompt dropout zeroes the token ids (id 0 = null)."""
    b = images.shape[0]
    t_rng, n_rng, d_rng = jax.random.split(rng, 3)
    t = jax.random.randint(t_rng, (b,), 0, schedule.num_steps)
    noise = jax.random.normal(n_rng, images.shape, images.dtype)
    ab = jnp.asarray(schedule.alpha_bar)[t][:, None, None, None]
    x_t = jnp.sqrt(ab) * images + jnp.sqrt(1.0 - ab) * noise
    drop = jax.random.bernoulli(d_rng, uncond_prob, (b, 1))
    ids = jnp.where(drop, 0, prompt_ids)
    eps = model.apply({"params": params}, x_t, seg_cond, t, ids)
    return jnp.mean(jnp.square(eps - noise))


def make_ddim_sampler(model: SegCondUNet, image_hw: Tuple[int, int],
                      schedule: NoiseSchedule = NoiseSchedule(),
                      steps: int = 50, cfg_scale: float = 9.0):
    """Jitted DDIM (eta=0) sampler with unconditional guidance, mirroring the
    reference's sampling call (50 steps, scale 9.0,
    ``generate_multishift_image.py:107-137``). Returns fn(params, seg_cond [1,H,W,3],
    prompt_ids [1,T], rng) -> image [1,H,W,3] in [-1,1]."""
    ts = np.linspace(0, schedule.num_steps - 1, steps).round().astype(np.int32)
    ab = schedule.alpha_bar[ts]  # ascending t
    ab_prev = np.concatenate([[1.0], ab[:-1]]).astype(np.float32)

    @jax.jit
    def sample(params, seg_cond, prompt_ids, rng):
        h, w = image_hw
        x = jax.random.normal(rng, (1, h, w, 3), jnp.float32)
        seg2 = jnp.concatenate([seg_cond, seg_cond], 0)
        ids2 = jnp.concatenate([prompt_ids, jnp.zeros_like(prompt_ids)], 0)
        ab_j, abp_j, ts_j = jnp.asarray(ab), jnp.asarray(ab_prev), jnp.asarray(ts)

        def body(i, x):
            k = steps - 1 - i  # descend from the noisiest step
            t = jnp.full((2,), ts_j[k], jnp.int32)
            eps2 = model.apply({"params": params},
                               jnp.concatenate([x, x], 0), seg2, t, ids2)
            eps_c, eps_u = eps2[:1], eps2[1:]
            eps = eps_u + cfg_scale * (eps_c - eps_u)
            x0 = (x - jnp.sqrt(1.0 - ab_j[k]) * eps) / jnp.sqrt(ab_j[k])
            x0 = jnp.clip(x0, -1.0, 1.0)
            return jnp.sqrt(abp_j[k]) * x0 + jnp.sqrt(1.0 - abp_j[k]) * eps

        return jax.lax.fori_loop(0, steps, body, x)

    return sample


class JaxSegDiffusion:
    """``DiffusionBackend`` implementation around :class:`SegCondUNet`.

    ``params=None`` random-initializes (useful for pipeline tests / from-scratch
    training); pass trained params for real generation.
    """

    def __init__(self, image_hw: Tuple[int, int], params=None, base: int = 64,
                 mults: Sequence[int] = (1, 2, 4), steps: int = 50,
                 cfg_scale: float = 9.0, seed: int = 0):
        self.model = SegCondUNet(base=base, mults=mults)
        self.image_hw = image_hw
        self._rng = jax.random.PRNGKey(seed)
        if params is None:
            h, w = image_hw
            z = jnp.zeros((1, h, w, 3))
            params = jax.jit(self.model.init)(
                {"params": jax.random.PRNGKey(seed)}, z, z,
                jnp.zeros((1,), jnp.int32), jnp.zeros((1, 32), jnp.int32),
            )["params"]
        self.params = params
        self._sampler = make_ddim_sampler(
            self.model, image_hw, steps=steps, cfg_scale=cfg_scale
        )

    def generate(self, seg_label_rgb: np.ndarray, prompt: str) -> np.ndarray:
        """[H, W, 3] uint8 ADE-palette label + prompt -> [H, W, 3] uint8 image."""
        h, w = self.image_hw
        assert seg_label_rgb.shape[:2] == (h, w), (seg_label_rgb.shape, self.image_hw)
        cond = jnp.asarray(seg_label_rgb, jnp.float32)[None] / 127.5 - 1.0
        ids = jnp.asarray(hash_prompt(prompt))[None]
        self._rng, rng = jax.random.split(self._rng)
        img = self._sampler(self.params, cond, ids, rng)
        return np.asarray(
            jnp.clip((img[0] + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
        )


def make_diffusion_train_step(model: SegCondUNet, tx,
                              schedule: NoiseSchedule = NoiseSchedule()):
    """Jitted DDPM train step over (images, seg_cond, prompt_ids) batches."""

    @jax.jit
    def step(params, opt_state, rng, images, seg_cond, prompt_ids):
        rng, loss_rng = jax.random.split(rng)
        loss, grads = jax.value_and_grad(
            lambda p: ddpm_loss(model, p, loss_rng, images, seg_cond, prompt_ids,
                                schedule)
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda a, u: a + u, params, updates)
        return params, opt_state, rng, loss

    return step
