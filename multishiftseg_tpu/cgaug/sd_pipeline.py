"""ControlNet-SD1.5 generation pipeline: schedules, DDIM+CFG sampling, decode.

Reproduces the reference generation loop (``CGAug/generate_multishift_image.py``
:107-137 and ``ControlNet/cldm/ddim_hacked.py``) on TPU:

* linear beta schedule, 1000 DDPM steps (ddpm.py register_schedule /
  util.make_beta_schedule: ``linspace(sqrt(0.00085), sqrt(0.012))**2``),
* uniform DDIM subsequence ``arange(0,1000,1000//S)+1`` (util.make_ddim_timesteps),
* eta=0 epsilon-parameterized update (ddim_hacked.p_sample_ddim:203-231),
* classifier-free guidance scale 9.0 with the seg hint active on BOTH branches
  (generate_multishift_image.py:120-121: un_cond keeps c_concat),
* latent scale factor 0.18215; decode via the VAE then map to uint8 RGB.

TPU-first structure: the whole S-step loop is one ``lax.scan`` inside a single
jit (static shapes, no host sync per step); the cond/uncond UNet evaluations run
as one batch of 2N so the MXU sees doubled matmuls instead of two launches.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .clip_text import CLIPTextConfig, CLIPTextEncoder
from .sd_unet import ControlNetBranch, SDUNet, SDUNetConfig
from .sd_vae import AutoencoderKL, VAEConfig


def make_beta_schedule(n: int = 1000, linear_start: float = 0.00085,
                       linear_end: float = 0.012) -> np.ndarray:
    """util.py:21-26 linear schedule, computed in float64 like the reference."""
    return np.linspace(linear_start ** 0.5, linear_end ** 0.5, n,
                       dtype=np.float64) ** 2


def ddim_schedule(num_steps: int, num_train: int = 1000,
                  linear_start: float = 0.00085, linear_end: float = 0.012,
                  eta: float = 0.0):
    """-> (timesteps [S], a_t [S], a_prev [S], sigma_t [S]) fp32 arrays, in
    sampling order index 0 = smallest t (the reference iterates index S-1..0)."""
    betas = make_beta_schedule(num_train, linear_start, linear_end)
    acp = np.cumprod(1.0 - betas)
    c = num_train // num_steps
    ts = np.arange(0, num_train, c) + 1
    a = acp[ts]
    a_prev = np.concatenate([[acp[0]], acp[ts[:-1]]])
    sigma = eta * np.sqrt((1 - a_prev) / (1 - a) * (1 - a / a_prev))
    return (ts.astype(np.int32), a.astype(np.float32),
            a_prev.astype(np.float32), sigma.astype(np.float32))


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    steps: int = 50
    guidance_scale: float = 9.0
    eta: float = 0.0
    num_train_timesteps: int = 1000
    scale_factor: float = 0.18215
    control_scale: float = 1.0


class ControlNetPipeline:
    """Holds the four converted towers and jits text-encode + sample + decode.

    params: {'unet', 'control', 'vae', 'clip'} from convert_control_sd15.
    """

    def __init__(self,
                 params,
                 unet_cfg: SDUNetConfig = SDUNetConfig(),
                 vae_cfg: VAEConfig = VAEConfig(),
                 clip_cfg: CLIPTextConfig = CLIPTextConfig(),
                 sampler: SamplerConfig = SamplerConfig()):
        self.params = params
        self.unet = SDUNet(unet_cfg)
        self.control = ControlNetBranch(unet_cfg)
        self.vae = AutoencoderKL(vae_cfg)
        self.clip = CLIPTextEncoder(clip_cfg)
        self.sampler = sampler
        # params are explicit jit ARGUMENTS — capturing the 1.2B-param tree as
        # closure constants bakes ~5 GB of literals into each compiled program
        # (measured: the lowering itself emitted a 4.88 GB-constant warning and
        # multiplied compile time)
        self._sample_jit = jax.jit(self._sample_impl)
        self._decode_jit = jax.jit(self._decode_impl)
        self._encode_jit = jax.jit(self._encode_impl)

    def _encode_impl(self, clip_params, tokens):
        return self.clip.apply({"params": clip_params}, tokens)

    def encode_text(self, tokens: jax.Array) -> jax.Array:
        return self._encode_jit(self.params["clip"], tokens)

    def _eps(self, params, x, hint, t, context):
        """cond/uncond stacked eps prediction with control residuals."""
        ctrl = self.control.apply({"params": params["control"]},
                                  x, hint, t, context)
        ctrl = [c * self.sampler.control_scale for c in ctrl]
        return self.unet.apply({"params": params["unet"]},
                               x, t, context, control=ctrl)

    def sample(self, x_T: jax.Array, hint: jax.Array, ctx_cond: jax.Array,
               ctx_uncond: jax.Array,
               key: Optional[jax.Array] = None) -> jax.Array:
        """DDIM sampling of latents [N, h, w, 4]; hint [N, H, W, 3] in [0,1].

        ``key`` drives the stochastic ``sigma_t * noise`` term and matters only
        for ``eta > 0`` (the reference default eta=0 is deterministic)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        return self._sample_jit(self.params, x_T, hint, ctx_cond, ctx_uncond, key)

    def _sample_impl(self, params, x_T, hint, ctx_cond, ctx_uncond, key):
        cfg = self.sampler
        ts, a_t, a_prev, sigma = ddim_schedule(
            cfg.steps, cfg.num_train_timesteps, eta=cfg.eta)
        n = x_T.shape[0]
        hint2 = jnp.concatenate([hint, hint])
        ctx2 = jnp.concatenate([ctx_cond, ctx_uncond])

        def step(carry, sched):
            x, k = carry
            t, at, ap, sg = sched
            t2 = jnp.full((2 * n,), t, jnp.int32)
            eps2 = self._eps(params, jnp.concatenate([x, x]), hint2, t2, ctx2)
            eps_c, eps_u = eps2[:n], eps2[n:]
            eps = eps_u + cfg.guidance_scale * (eps_c - eps_u)
            pred_x0 = (x - jnp.sqrt(1.0 - at) * eps) / jnp.sqrt(at)
            dir_xt = jnp.sqrt(1.0 - ap - sg ** 2) * eps
            # p_sample_ddim's sigma_t * noise term (ddim_hacked.py:226-229);
            # zero for eta=0, so the deterministic path is unchanged
            k, kn = jax.random.split(k)
            noise = sg * jax.random.normal(kn, x.shape, x.dtype)
            return (jnp.sqrt(ap) * pred_x0 + dir_xt + noise, k), None

        sched = (jnp.asarray(ts)[::-1], jnp.asarray(a_t)[::-1],
                 jnp.asarray(a_prev)[::-1], jnp.asarray(sigma)[::-1])
        (x, _), _ = jax.lax.scan(step, (x_T, key), sched)
        return x

    def decode(self, z: jax.Array) -> jax.Array:
        """latents -> RGB float in [0, 255] (decode_first_stage then the
        *127.5+127.5 mapping of generate_multishift_image.py:136-138)."""
        return self._decode_jit(self.params["vae"], z)

    def _decode_impl(self, vae_params, z):
        x = self.vae.apply({"params": vae_params}, z / self.sampler.scale_factor,
                           method=AutoencoderKL.decode)
        return jnp.clip(x * 127.5 + 127.5, 0.0, 255.0)

    def generate_latents(self, hint: jax.Array, tokens_cond, tokens_uncond,
                         key: jax.Array) -> jax.Array:
        n, H, W = hint.shape[0], hint.shape[1], hint.shape[2]
        x_T = jax.random.normal(key, (n, H // 8, W // 8, 4))
        ctx_c = self.encode_text(tokens_cond)
        ctx_u = self.encode_text(tokens_uncond)
        return self.sample(x_T, hint, ctx_c, ctx_u)


class SDControlNetGenerator:
    """:class:`cgaug.generate.DiffusionBackend` over real ControlNet weights.

    Drop-in alternative to ``JaxSegDiffusion`` once ``control_sd15_seg.pth``
    (and the CLIP tokenizer assets) are fetched via ``cgaug/weights.py``:

        params = convert.sd_controlnet.load_control_sd15(path)
        gen = SDControlNetGenerator(params, tokenizer)

    ``generate`` takes the ADE20K-palette label map and the prompt string, like
    the reference's ``Semantic2ImageGenerator.generate`` (its a_prompt/n_prompt
    defaults are applied here).
    """

    A_PROMPT = "best quality, extremely detailed"
    N_PROMPT = ("longbody, lowres, bad anatomy, bad hands, missing fingers, "
                "extra digit, fewer digits, cropped, worst quality, low quality")

    def __init__(self, params, tokenizer, pipeline: Optional[ControlNetPipeline] = None,
                 seed: int = 0, **pipe_kw):
        self.pipe = pipeline or ControlNetPipeline(params, **pipe_kw)
        self.tokenizer = tokenizer
        self._key = jax.random.PRNGKey(seed)

    def generate(self, seg_label_rgb: np.ndarray, prompt: str) -> np.ndarray:
        self._key, key = jax.random.split(self._key)
        hint = jnp.asarray(seg_label_rgb[None], jnp.float32) / 255.0
        toks_c = jnp.asarray(self.tokenizer([f"{prompt}, {self.A_PROMPT}"]))
        toks_u = jnp.asarray(self.tokenizer([self.N_PROMPT]))
        z = self.pipe.generate_latents(hint, toks_c, toks_u, key)
        img = self.pipe.decode(z)
        return np.asarray(img[0]).astype(np.uint8)
