"""ControlNet-SD1.5 generation throughput on the attached TPU.

Measures the full-scale stack (860M-param SD UNet + 360M ControlNet branch,
bf16, random init — weights don't change FLOPs) at the reference's generation
geometry: 512x512 images, 64x64x4 latents, 50 DDIM steps with CFG (2N batch per
step), matching ``CGAug/generate_multishift_image.py:129-133``.

Prints per-step UNet+ControlNet latency and the end-to-end seconds/image
(sampling + VAE decode). Context: the reference runs this stack in fp16 torch
on A100/V100-class GPUs at roughly 3-6 s/image for 50 steps.

Usage: python tools/bench_sd.py [--steps 50] [--res 512]
"""

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from multishiftseg_tpu.cgaug.clip_text import CLIPTextConfig, CLIPTextEncoder
    from multishiftseg_tpu.cgaug.sd_pipeline import (ControlNetPipeline,
                                                     SamplerConfig)
    from multishiftseg_tpu.cgaug.sd_unet import (ControlNetBranch, SDUNet,
                                                 SDUNetConfig)
    from multishiftseg_tpu.cgaug.sd_vae import AutoencoderKL, VAEConfig

    dt = jnp.bfloat16
    ucfg = SDUNetConfig(dtype=dt)
    vcfg = VAEConfig(dtype=dt)
    ccfg = CLIPTextConfig(dtype=dt)
    res = args.res
    lat = res // 8
    k = jax.random.PRNGKey(0)

    print("initializing (full-scale SD1.5 + ControlNet, bf16)...", flush=True)
    t0 = time.time()
    x = jnp.zeros((1, lat, lat, 4))
    hint = jnp.zeros((1, res, res, 3))
    ctx = jnp.zeros((1, 77, ccfg.width))
    ts = jnp.zeros((1,), jnp.int32)
    up = jax.jit(SDUNet(ucfg).init)(k, x, ts, ctx)["params"]
    cp = jax.jit(ControlNetBranch(ucfg).init)(k, x, hint, ts, ctx)["params"]
    vp = jax.jit(AutoencoderKL(vcfg).init)(k, jnp.zeros((1, 32, 32, 3)))["params"]
    clp = jax.jit(CLIPTextEncoder(ccfg).init)(k, jnp.zeros((1, 77), jnp.int32))["params"]
    n_params = sum(p.size for p in jax.tree.leaves(up)) + sum(
        p.size for p in jax.tree.leaves(cp))
    print(f"init {time.time() - t0:.1f}s; unet+control params {n_params / 1e6:.0f}M",
          flush=True)

    pipe = ControlNetPipeline({"unet": up, "control": cp, "vae": vp, "clip": clp},
                              unet_cfg=ucfg, vae_cfg=vcfg, clip_cfg=ccfg,
                              sampler=SamplerConfig(steps=args.steps))

    # Timing discipline (see bench.py / PERF.md): block_until_ready has been
    # observed to return EARLY over the tunneled device transport, so every
    # timed window chains a data dependency through the iterations and ends
    # with a host scalar read. Noise inputs dodge constant folding.
    kk = jax.random.split(jax.random.PRNGKey(3), 4)
    x2 = jax.random.normal(kk[0], (2, lat, lat, 4))
    hint2 = jax.random.uniform(kk[1], (2, res, res, 3))
    ctx2 = jax.random.normal(kk[2], (2, 77, ccfg.width))
    t2 = jnp.full((2,), 500, jnp.int32)
    params = {"unet": up, "control": cp}
    step = jax.jit(lambda p, x, h, t, c: pipe._eps(p, x, h, t, c))
    step = functools.partial(step, params)
    float(jnp.sum(step(x2, hint2, t2, ctx2).astype(jnp.float32)))  # compile
    n_it, per_step = 10, float("inf")
    for _ in range(3):  # best-of-windows: transient transport slow phases
        t0 = time.perf_counter()
        xx = x2
        for _ in range(n_it):
            eps = step(xx, hint2, t2, ctx2)
            xx = x2 + 0.0 * eps.astype(x2.dtype)
        float(jnp.sum(xx.astype(jnp.float32)))
        per_step = min(per_step, (time.perf_counter() - t0) / n_it)
    print(f"denoise step (CFG batch 2, {res}x{res}): {per_step * 1e3:.1f} ms",
          flush=True)

    # end-to-end: sample + decode (one host-read-bounded window per image)
    toks = jnp.zeros((1, 77), jnp.int32)
    z = pipe.generate_latents(hint, toks, toks, jax.random.PRNGKey(1))
    float(jnp.sum(pipe.decode(z)))  # compile both programs
    e2e = float("inf")
    for i in range(args.iters):
        t0 = time.perf_counter()
        z = pipe.generate_latents(hint, toks, toks, jax.random.PRNGKey(2 + i))
        float(jnp.sum(pipe.decode(z)))
        e2e = min(e2e, time.perf_counter() - t0)
    print(f"end-to-end {args.steps}-step generation + decode: {e2e:.2f} s/image "
          f"({args.steps * per_step:.2f} s predicted from step latency)", flush=True)


if __name__ == "__main__":
    main()
