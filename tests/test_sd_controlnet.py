"""Golden parity for the ControlNet-SD1.5 weight-reuse path.

Oracles are the reference's vendored torch stack
(``/root/reference/CGAug/ControlNet``) instantiated at GroupNorm32-compatible
miniature configs with randomized weights, exported through the EXACT
``control_sd15_seg.pth`` key layout, converted by ``convert/sd_controlnet.py``
and compared against the flax towers:

* ControlledUnetModel + ControlNet forward (cldm.py:21-305) incl. control
  residual injection and hint CNN;
* AutoencoderKL encode moments / decode (ldm/models/autoencoder.py);
* CLIPTextModel last hidden states (FrozenCLIPEmbedder layer="last") vs the
  huggingface torch implementation;
* the full DDIM+CFG sampling loop vs ddim_hacked.DDIMSampler driving the same
  tiny torch model pair;
* CLIP BPE tokenizer vs huggingface CLIPTokenizer on synthetic vocab files.

pytorch_lightning / omegaconf / torchvision are absent in this environment; the
import chain of the vendored cldm modules is satisfied with inert stubs (the
classes under test never call into them).
"""

import json
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

CONTROLNET_DIR = "/root/reference/CGAug/ControlNet"


def _stub(name):
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def ref():
    """Import the vendored torch ControlNet modules with dependency stubs."""
    import torch
    from torch import nn

    if "pytorch_lightning" not in sys.modules:
        pl = _stub("pytorch_lightning")
        pl.LightningModule = nn.Module
        pl.seed_everything = lambda *a, **k: None
        plu = _stub("pytorch_lightning.utilities")
        plud = _stub("pytorch_lightning.utilities.distributed")
        plud.rank_zero_only = lambda f: f
        plu.distributed = plud
        pl.utilities = plu
    # upgrade, don't skip: another test file (test_m2f_parity) may have left a
    # bare non-package `torchvision` stub — `import torchvision.utils` then
    # fails unless the submodule entry exists in sys.modules too
    tv = sys.modules.get("torchvision") or _stub("torchvision")
    tvu = sys.modules.get("torchvision.utils") or _stub("torchvision.utils")
    if not hasattr(tvu, "make_grid"):
        tvu.make_grid = lambda *a, **k: None
    tv.utils = tvu
    if "omegaconf" not in sys.modules:
        oc = _stub("omegaconf")

        class ListConfig(list):
            pass

        oc.ListConfig = ListConfig
        ocl = _stub("omegaconf.listconfig")
        ocl.ListConfig = ListConfig
        oc.listconfig = ocl

    if CONTROLNET_DIR not in sys.path:
        sys.path.insert(0, CONTROLNET_DIR)
    import cldm.cldm as cldm_mod
    import cldm.ddim_hacked as ddim_mod
    import ldm.models.autoencoder as ae_mod
    import ldm.modules.diffusionmodules.util as util_mod

    return types.SimpleNamespace(cldm=cldm_mod, ddim=ddim_mod, ae=ae_mod,
                                 util=util_mod, torch=torch)


# ---------------------------------------------------------------------------
# tiny configs (32-channel minimum so GroupNorm(32) is valid on both sides)
# ---------------------------------------------------------------------------

def _tiny_torch_unet_kwargs():
    return dict(image_size=8, in_channels=4, out_channels=4, model_channels=32,
                num_res_blocks=1, attention_resolutions=[1, 2],
                channel_mult=(1, 2), num_heads=4, use_spatial_transformer=True,
                transformer_depth=1, context_dim=16, use_checkpoint=False,
                legacy=False)


def _tiny_jax_cfg():
    from multishiftseg_tpu.cgaug.sd_unet import tiny_sd_config

    return tiny_sd_config()


def _randomize(module, seed):
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.uniform_(-0.15, 0.15, generator=g)


def _prefixed_sd(module, prefix):
    return {prefix + k: v for k, v in module.state_dict().items()}


def _nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def _nhwc(t):
    return jnp.asarray(np.transpose(t.detach().numpy(), (0, 2, 3, 1)))


@pytest.fixture(scope="module")
def torch_pair(ref):
    """(ControlledUnetModel, ControlNet) tiny torch pair with random weights."""
    torch = ref.torch
    torch.manual_seed(0)
    unet = ref.cldm.ControlledUnetModel(**_tiny_torch_unet_kwargs()).eval()
    kw = _tiny_torch_unet_kwargs()
    kw.pop("out_channels")
    ctrl = ref.cldm.ControlNet(hint_channels=3, **kw).eval()
    # shrink the hint CNN to the tiny widths used by tiny_sd_config
    widths = (8, 8, 16, 16, 24, 24, 32)
    from ldm.modules.diffusionmodules.util import conv_nd, zero_module
    from torch import nn

    seq, cin = [], 3
    strided = {2, 4, 6}
    for j, w in enumerate(widths):
        seq.append(conv_nd(2, cin, w, 3, padding=1,
                           stride=2 if j in strided else 1))
        seq.append(nn.SiLU())
        cin = w
    seq.append(zero_module(conv_nd(2, cin, 32, 3, padding=1)))
    ctrl.input_hint_block = ref.cldm.TimestepEmbedSequential(*seq)
    _randomize(unet, 1)
    _randomize(ctrl, 2)
    return unet, ctrl


@pytest.fixture(scope="module")
def jax_pair(torch_pair):
    from multishiftseg_tpu.cgaug.sd_unet import ControlNetBranch, SDUNet
    from multishiftseg_tpu.convert.sd_controlnet import (convert_controlnet,
                                                         convert_sd_unet)
    from multishiftseg_tpu.convert.torch2jax import _np

    unet_t, ctrl_t = torch_pair
    cfg = _tiny_jax_cfg()
    sd = _np({**_prefixed_sd(unet_t, "model.diffusion_model."),
              **_prefixed_sd(ctrl_t, "control_model.")})
    unet_params = convert_sd_unet(sd, cfg)
    ctrl_params = convert_controlnet(sd, cfg)
    return SDUNet(cfg), unet_params, ControlNetBranch(cfg), ctrl_params


@pytest.mark.slow
def test_unet_golden_parity_no_control(torch_pair, jax_pair):
    import torch

    unet_t, _ = torch_pair
    unet_j, unet_p, _, _ = jax_pair
    rng = np.random.RandomState(3)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    ctx = rng.randn(2, 5, 16).astype(np.float32)
    t = np.array([7, 903], np.int64)
    with torch.no_grad():
        ref_out = unet_t(torch.tensor(x), timesteps=torch.tensor(t),
                         context=torch.tensor(ctx), control=None)
    got = unet_j.apply({"params": unet_p}, _nhwc(torch.tensor(x)),
                       jnp.asarray(t), jnp.asarray(ctx))
    np.testing.assert_allclose(_nchw(got), ref_out.numpy(), atol=2e-5, rtol=1e-4)


def test_controlnet_branch_golden_parity(torch_pair, jax_pair):
    import torch

    _, ctrl_t = torch_pair
    _, _, ctrl_j, ctrl_p = jax_pair
    rng = np.random.RandomState(4)
    x = rng.randn(1, 4, 8, 8).astype(np.float32)
    hint = rng.rand(1, 3, 64, 64).astype(np.float32)
    ctx = rng.randn(1, 5, 16).astype(np.float32)
    t = np.array([411], np.int64)
    with torch.no_grad():
        ref_outs = ctrl_t(torch.tensor(x), torch.tensor(hint),
                          torch.tensor(t), torch.tensor(ctx))
    got = ctrl_j.apply({"params": ctrl_p}, _nhwc(torch.tensor(x)),
                       _nhwc(torch.tensor(hint)), jnp.asarray(t), jnp.asarray(ctx))
    assert len(got) == len(ref_outs)  # 13 taps for the full model; tiny: 2 levels
    for g, r in zip(got, ref_outs):
        np.testing.assert_allclose(_nchw(g), r.numpy(), atol=2e-5, rtol=1e-4)


def test_controlled_unet_with_control_parity(torch_pair, jax_pair):
    import torch

    unet_t, ctrl_t = torch_pair
    unet_j, unet_p, ctrl_j, ctrl_p = jax_pair
    rng = np.random.RandomState(5)
    x = rng.randn(1, 4, 8, 8).astype(np.float32)
    hint = rng.rand(1, 3, 64, 64).astype(np.float32)
    ctx = rng.randn(1, 5, 16).astype(np.float32)
    t = np.array([250], np.int64)
    with torch.no_grad():
        control = ctrl_t(torch.tensor(x), torch.tensor(hint),
                         torch.tensor(t), torch.tensor(ctx))
        control = [c * 1.0 for c in control]
        ref_out = unet_t(torch.tensor(x), timesteps=torch.tensor(t),
                         context=torch.tensor(ctx), control=control)
    ctrl = ctrl_j.apply({"params": ctrl_p}, _nhwc(torch.tensor(x)),
                        _nhwc(torch.tensor(hint)), jnp.asarray(t), jnp.asarray(ctx))
    got = unet_j.apply({"params": unet_p}, _nhwc(torch.tensor(x)),
                       jnp.asarray(t), jnp.asarray(ctx), control=ctrl)
    np.testing.assert_allclose(_nchw(got), ref_out.numpy(), atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def test_vae_golden_parity(ref):
    import torch

    from multishiftseg_tpu.cgaug.sd_vae import AutoencoderKL, tiny_vae_config
    from multishiftseg_tpu.convert.sd_controlnet import convert_vae
    from multishiftseg_tpu.convert.torch2jax import _np

    cfg = tiny_vae_config(attn_resolutions=(16,))
    ddconfig = dict(double_z=True, z_channels=4, resolution=32, in_channels=3,
                    out_ch=3, ch=32, ch_mult=list(cfg.ch_mult),
                    num_res_blocks=1, attn_resolutions=[16], dropout=0.0)
    torch.manual_seed(0)
    vae_t = ref.ae.AutoencoderKL(ddconfig=ddconfig,
                                 lossconfig={"target": "torch.nn.Identity"},
                                 embed_dim=4).eval()
    _randomize(vae_t, 7)
    params = convert_vae(_np(_prefixed_sd(vae_t, "first_stage_model.")), cfg)
    vae_j = AutoencoderKL(cfg)

    rng = np.random.RandomState(8)
    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        post = vae_t.encode(torch.tensor(x))
        ref_mean, ref_logvar = post.mean, post.logvar
        z = rng.randn(1, 4, 16, 16).astype(np.float32)
        ref_dec = vae_t.decode(torch.tensor(z))
    mean, logvar = vae_j.apply({"params": params}, _nhwc(torch.tensor(x)),
                               method=AutoencoderKL.encode)
    np.testing.assert_allclose(_nchw(mean), ref_mean.numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(_nchw(logvar), ref_logvar.numpy(), atol=3e-5, rtol=1e-4)
    dec = vae_j.apply({"params": params}, _nhwc(torch.tensor(z)),
                      method=AutoencoderKL.decode)
    np.testing.assert_allclose(_nchw(dec), ref_dec.numpy(), atol=3e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------

def test_clip_text_golden_parity():
    import torch
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel

    from multishiftseg_tpu.cgaug.clip_text import CLIPTextEncoder, tiny_clip_config
    from multishiftseg_tpu.convert.sd_controlnet import convert_clip_text
    from multishiftseg_tpu.convert.torch2jax import _np

    cfg = tiny_clip_config()
    hf = CLIPTextModel(HFConfig(vocab_size=cfg.vocab_size, hidden_size=cfg.width,
                                intermediate_size=cfg.width * 4,
                                num_hidden_layers=cfg.layers,
                                num_attention_heads=cfg.heads,
                                max_position_embeddings=cfg.max_len,
                                hidden_act="quick_gelu")).eval()
    _randomize(hf, 11)
    params = convert_clip_text(_np(_prefixed_sd(hf, "cond_stage_model.transformer.")),
                               cfg)
    tokens = np.array([[49, 3, 17, 96, 2, 2, 2],
                       [49, 5, 5, 5, 5, 5, 96]], np.int32) % cfg.vocab_size
    with torch.no_grad():
        ref_out = hf(input_ids=torch.tensor(tokens, dtype=torch.long)).last_hidden_state
    got = CLIPTextEncoder(cfg).apply({"params": params}, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(got), ref_out.numpy(), atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# DDIM + CFG sampling loop
# ---------------------------------------------------------------------------

N_TRAIN, N_STEPS = 40, 8


class _FakeLDM:
    """The minimal LatentDiffusion surface DDIMSampler reads (schedule buffers
    + apply_model), wrapping the tiny torch UNet/ControlNet pair."""

    parameterization = "eps"

    def __init__(self, ref, unet, ctrl):
        import torch

        betas = np.asarray(ref.util.make_beta_schedule(
            "linear", N_TRAIN, linear_start=0.00085, linear_end=0.012))
        acp = np.cumprod(1.0 - betas)
        self.betas = torch.tensor(betas, dtype=torch.float32)
        self.alphas_cumprod = torch.tensor(acp, dtype=torch.float32)
        self.alphas_cumprod_prev = torch.tensor(
            np.append(1.0, acp[:-1]), dtype=torch.float32)
        self.sqrt_one_minus_alphas_cumprod = torch.tensor(
            np.sqrt(1.0 - acp), dtype=torch.float32)
        self.num_timesteps = N_TRAIN
        self.device = torch.device("cpu")
        self.unet, self.ctrl = unet, ctrl

    def apply_model(self, x, t, cond):
        import torch

        ctx = torch.cat(cond["c_crossattn"], 1)
        control = self.ctrl(x, torch.cat(cond["c_concat"], 1), t, ctx)
        control = [c * 1.0 for c in control]
        return self.unet(x, timesteps=t, context=ctx, control=control)


def test_ddim_cfg_sampling_loop_parity(ref, torch_pair, monkeypatch):
    import torch

    from multishiftseg_tpu.cgaug.sd_pipeline import ddim_schedule

    unet_t, ctrl_t = torch_pair
    fake = _FakeLDM(ref, unet_t, ctrl_t)
    monkeypatch.setattr(ref.ddim.DDIMSampler, "register_buffer",
                        lambda self, name, attr: setattr(self, name, attr))
    sampler = ref.ddim.DDIMSampler(fake)

    rng = np.random.RandomState(13)
    x_T = rng.randn(1, 4, 8, 8).astype(np.float32)
    hint = rng.rand(1, 3, 64, 64).astype(np.float32)
    ctx_c = rng.randn(1, 5, 16).astype(np.float32)
    ctx_u = rng.randn(1, 5, 16).astype(np.float32)
    cond = {"c_concat": [torch.tensor(hint)], "c_crossattn": [torch.tensor(ctx_c)]}
    un_cond = {"c_concat": [torch.tensor(hint)], "c_crossattn": [torch.tensor(ctx_u)]}
    with torch.no_grad():
        ref_samples, _ = sampler.sample(N_STEPS, 1, (4, 8, 8), cond, verbose=False,
                                        eta=0.0, x_T=torch.tensor(x_T),
                                        unconditional_guidance_scale=9.0,
                                        unconditional_conditioning=un_cond)

    # jax side: same schedule constants, same weights, one lax.scan
    from multishiftseg_tpu.cgaug.sd_pipeline import (ControlNetPipeline,
                                                     SamplerConfig)
    from multishiftseg_tpu.cgaug.sd_unet import ControlNetBranch, SDUNet
    from multishiftseg_tpu.convert.sd_controlnet import (convert_controlnet,
                                                         convert_sd_unet)
    from multishiftseg_tpu.convert.torch2jax import _np

    ts, a, ap, sg = ddim_schedule(N_STEPS, N_TRAIN)
    np.testing.assert_allclose(ts, sampler.ddim_timesteps)
    np.testing.assert_allclose(a, np.asarray(sampler.ddim_alphas), rtol=1e-6)
    np.testing.assert_allclose(ap, np.asarray(sampler.ddim_alphas_prev), rtol=1e-6)

    cfg = _tiny_jax_cfg()
    sd = _np({**_prefixed_sd(unet_t, "model.diffusion_model."),
              **_prefixed_sd(ctrl_t, "control_model.")})
    params = {"unet": convert_sd_unet(sd, cfg),
              "control": convert_controlnet(sd, cfg), "vae": {}, "clip": {}}
    pipe = ControlNetPipeline(params, unet_cfg=cfg,
                              sampler=SamplerConfig(steps=N_STEPS,
                                                    num_train_timesteps=N_TRAIN))
    got = pipe.sample(_nhwc(torch.tensor(x_T)), _nhwc(torch.tensor(hint)),
                      jnp.asarray(ctx_c), jnp.asarray(ctx_u))
    np.testing.assert_allclose(_nchw(got), ref_samples.numpy(), atol=5e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

def _write_tiny_vocab(tmp_path):
    from multishiftseg_tpu.cgaug.clip_text import bytes_to_unicode

    chars = sorted(bytes_to_unicode().values())
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    for tok in ["ll", "he", "llo</w>", "hello</w>", "wo", "rld</w>",
                "<|startoftext|>", "<|endoftext|>"]:
        vocab[tok] = len(vocab)
    merges = ["#version: 0.2", "l l", "h e", "ll o</w>", "he llo</w>",
              "w o", "r ld</w>"]
    vp = tmp_path / "vocab.json"
    mp = tmp_path / "merges.txt"
    vp.write_text(json.dumps(vocab))
    mp.write_text("\n".join(merges) + "\n")
    return str(vp), str(mp)


def test_tokenizer_matches_huggingface(tmp_path):
    from transformers import CLIPTokenizer as HFTok

    from multishiftseg_tpu.cgaug.clip_text import CLIPTokenizer

    vp, mp = _write_tiny_vocab(tmp_path)
    hf = HFTok(vocab_file=vp, merges_file=mp)
    mine = CLIPTokenizer(vp, mp, max_len=16)
    for text in ["hello world", "Hello,  WORLD!", "hello hello hello",
                 "world... hello?", "a b c hello"]:
        ref_ids = hf(text, truncation=True, max_length=16, padding="max_length")[
            "input_ids"]
        got = mine([text])[0].tolist()
        assert got == ref_ids, (text, got, ref_ids)


# ---------------------------------------------------------------------------
# e2e generator smoke (tiny everything, converted weights)
# ---------------------------------------------------------------------------

def test_sd_generator_end_to_end(ref, torch_pair, tmp_path):
    import torch
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel

    from multishiftseg_tpu.cgaug.clip_text import CLIPTokenizer, tiny_clip_config
    from multishiftseg_tpu.cgaug.sd_pipeline import (ControlNetPipeline,
                                                     SamplerConfig,
                                                     SDControlNetGenerator)
    from multishiftseg_tpu.cgaug.sd_vae import tiny_vae_config
    from multishiftseg_tpu.convert.sd_controlnet import convert_control_sd15

    unet_t, ctrl_t = torch_pair
    cfg = _tiny_jax_cfg()
    vae_cfg = tiny_vae_config()

    ddconfig = dict(double_z=True, z_channels=4, resolution=32, in_channels=3,
                    out_ch=3, ch=32, ch_mult=list(vae_cfg.ch_mult),
                    num_res_blocks=1, attn_resolutions=[], dropout=0.0)
    vae_t = ref.ae.AutoencoderKL(ddconfig=ddconfig,
                                 lossconfig={"target": "torch.nn.Identity"},
                                 embed_dim=4).eval()
    _randomize(vae_t, 21)

    vp, mp = _write_tiny_vocab(tmp_path)
    tok = CLIPTokenizer(vp, mp, max_len=16)
    import dataclasses

    # clip width must equal the unet's context_dim (768 in SD1.5; 16 tiny)
    clip_cfg = dataclasses.replace(tiny_clip_config(), vocab_size=len(tok.encoder),
                                   max_len=16, width=16)
    hf = CLIPTextModel(HFConfig(vocab_size=clip_cfg.vocab_size,
                                hidden_size=clip_cfg.width,
                                intermediate_size=clip_cfg.width * 4,
                                num_hidden_layers=clip_cfg.layers,
                                num_attention_heads=clip_cfg.heads,
                                max_position_embeddings=clip_cfg.max_len,
                                hidden_act="quick_gelu")).eval()
    _randomize(hf, 22)

    state = {**_prefixed_sd(unet_t, "model.diffusion_model."),
             **_prefixed_sd(ctrl_t, "control_model."),
             **_prefixed_sd(vae_t, "first_stage_model."),
             **_prefixed_sd(hf, "cond_stage_model.transformer.")}
    params = convert_control_sd15(state, unet_cfg=cfg, vae_cfg=vae_cfg,
                                  clip_cfg=clip_cfg)
    pipe = ControlNetPipeline(params, unet_cfg=cfg, vae_cfg=vae_cfg,
                              clip_cfg=clip_cfg,
                              sampler=SamplerConfig(steps=4,
                                                    num_train_timesteps=40))
    gen = SDControlNetGenerator(params, tok, pipeline=pipe)
    label = (np.random.RandomState(0).rand(32, 32, 3) * 255).astype(np.uint8)
    img = gen.generate(label, "hello world")
    assert img.dtype == np.uint8
    # tiny VAE upsamples x2 from the /8 latent grid
    assert img.shape == (8, 8, 3)
    assert np.isfinite(img.astype(np.float32)).all()
