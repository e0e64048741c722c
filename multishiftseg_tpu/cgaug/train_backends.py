"""Training drivers for the CG-Aug backends.

The reference reuses frozen pretrained generation models (ControlNet SD1.5 + SAM
ViT-H). This framework's backends are compact and trainable instead; this module
provides the training loops that fit them on real data, TPU-jitted:

* ``train_diffusion`` — fit :class:`~multishiftseg_tpu.cgaug.diffusion.SegCondUNet`
  on (image, gtFine color label) pairs walked from a Cityscapes layout, the same
  conditioning pairing CG-Aug samples at generation time
  (``CGAug/generate_multishift_image.py:187-234`` reads ``_gtFine_color.png``).
* ``train_segmenter`` — fit :class:`~multishiftseg_tpu.cgaug.segmenter.PromptUNet`
  on box-prompt -> mask pairs synthesized from any instance-mask source (COCO-style
  binary masks, e.g. the OOD cut-out bank ``DiverseCityscapes`` indexes).

CLI:
  python -m multishiftseg_tpu.cgaug.train_backends diffusion \\
      --cityscapes_root data/cityscapes --out ckpts/cgaug [--steps N]
  python -m multishiftseg_tpu.cgaug.train_backends segmenter \\
      --mask_dir data/coco_masks --out ckpts/cgaug [--steps N]
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
import time
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp
import optax

from ..train.checkpoint import CheckpointManager
from .diffusion import SegCondUNet, hash_prompt, make_diffusion_train_step
from .segmenter import PromptUNet, _box_channel, make_segmenter_train_step

log = logging.getLogger(__name__)


def walk_color_pairs(cityscapes_root: str, split: str = "train") -> List[Tuple[str, str]]:
    """(image, _gtFine_color.png) pairs from a Cityscapes layout."""
    pairs = []
    img_dir = os.path.join(cityscapes_root, "leftImg8bit", split)
    for img in sorted(glob.glob(os.path.join(img_dir, "**", "*_leftImg8bit.png"),
                                recursive=True)):
        color = img.replace("leftImg8bit", "gtFine", 1).replace(
            "_gtFine.png", ".png"
        ).replace("_leftImg8bit.png", "_gtFine_color.png")
        if os.path.exists(color):
            pairs.append((img, color))
    return pairs


def _load_pair(img_path: str, lbl_path: str, hw: Tuple[int, int]):
    h, w = hw
    img = Image.open(img_path).convert("RGB").resize((w, h), Image.BILINEAR)
    lbl = Image.open(lbl_path).convert("RGB").resize((w, h), Image.NEAREST)
    return (np.asarray(img, np.float32) / 127.5 - 1.0,
            np.asarray(lbl, np.float32) / 127.5 - 1.0)


def train_diffusion(
    cityscapes_root: str,
    out_dir: str,
    steps: int = 20000,
    batch: int = 8,
    image_hw: Tuple[int, int] = (256, 512),
    lr: float = 1e-4,
    base: int = 64,
    seed: int = 0,
    log_every: int = 100,
    save_every: int = 1000,
):
    pairs = walk_color_pairs(cityscapes_root)
    if not pairs:
        raise FileNotFoundError(f"no (image, color label) pairs under {cityscapes_root}")
    log.warning("diffusion: %d pairs, %d steps @ batch %d", len(pairs), steps, batch)

    model = SegCondUNet(base=base)
    h, w = image_hw
    z = jnp.zeros((1, h, w, 3))
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(seed)}, z, z,
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 32), jnp.int32),
    )["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    step_fn = make_diffusion_train_step(model, tx)
    key = jax.random.PRNGKey(seed + 1)
    ckpt = CheckpointManager(out_dir)
    # generation prompts are domain sentences; train unconditionally-biased with
    # the plain dashcam prompt (classifier-free dropout handles the null path)
    ids = jnp.asarray(
        np.tile(hash_prompt("a photo taken from a dash cam"), (batch, 1))
    )

    rng = np.random.RandomState(seed)
    t0, last = time.time(), 0.0
    for it in range(steps):
        sel = rng.randint(0, len(pairs), batch)
        imgs, lbls = zip(*[_load_pair(*pairs[i], image_hw) for i in sel])
        params, opt_state, key, loss = step_fn(
            params, opt_state, key, jnp.asarray(np.stack(imgs)),
            jnp.asarray(np.stack(lbls)), ids,
        )
        last = float(loss)
        if it % log_every == 0:
            log.warning("step %d loss %.4f (%.1f img/s)", it, last,
                        batch * (it + 1) / max(time.time() - t0, 1e-9))
        if save_every and (it + 1) % save_every == 0:
            ckpt.save("diffusion_last", params=params, step=np.int64(it))
    ckpt.save("diffusion_last", params=params, step=np.int64(steps - 1))
    return params, last


def train_segmenter(
    out_dir: str,
    mask_dir: Optional[str] = None,
    steps: int = 5000,
    batch: int = 8,
    size: int = 128,
    lr: float = 1e-3,
    base: int = 32,
    seed: int = 0,
    log_every: int = 100,
):
    """Box-prompt -> mask training. With ``mask_dir`` (binary mask pngs), each
    sample pastes a real object mask at a random box; otherwise synthetic
    rectangles (enough to learn the prompting mechanics).

    The composite renders the object VISIBLY: background = smooth random color
    field + texture, object pixels = a different random color + texture. The
    pre-round-4 version drew pure-noise images with the target invisible, so
    the model could only learn "fill the box" — which structurally caps the
    SAM-IoU filter pass rate at the shape's box-fill fraction (a cross fills
    ~55% of its box < the 0.7 gate). Visible objects make the task the one the
    filter actually needs: segment the salient object inside the box.
    """
    masks: List[np.ndarray] = []
    if mask_dir:
        for p in sorted(glob.glob(os.path.join(mask_dir, "**", "*.png"),
                                  recursive=True))[:2000]:
            m = np.asarray(Image.open(p).convert("L")) > 127
            if m.any():
                masks.append(m.astype(np.float32))
        log.warning("segmenter: %d object masks", len(masks))

    model = PromptUNet(base=base)
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(seed)}, jnp.zeros((1, size, size, 4))
    )["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    step_fn = make_segmenter_train_step(model, tx)
    ckpt = CheckpointManager(out_dir)
    rng = np.random.RandomState(seed)
    last = 0.0
    for it in range(steps):
        xs, ts = [], []
        for _ in range(batch):
            target = np.zeros((size, size), np.float32)
            if masks:
                m = masks[rng.randint(len(masks))]
                ys, xs_ = np.where(m > 0)
                crop = m[ys.min():ys.max() + 1, xs_.min():xs_.max() + 1]
                sc = rng.randint(size // 4, size - 4) / max(crop.shape)
                nh = max(int(crop.shape[0] * sc), 2)
                nw = max(int(crop.shape[1] * sc), 2)
                crop = np.asarray(
                    Image.fromarray((crop * 255).astype(np.uint8)).resize(
                        (nw, nh), Image.NEAREST)) > 127
                y0 = rng.randint(0, size - nh + 1)
                x0 = rng.randint(0, size - nw + 1)
                target[y0:y0 + nh, x0:x0 + nw] = crop
            else:
                x0, y0 = rng.randint(0, size - 8, 2)
                x1 = x0 + rng.randint(4, size - x0 + 1)
                y1 = y0 + rng.randint(4, size - y0 + 1)
                target[y0:y1, x0:x1] = 1.0
            ys, xs_ = np.where(target > 0)
            box = np.asarray([xs_.min(), ys.min(), xs_.max(), ys.max()])
            bg = rng.rand(3).astype(np.float32) * 2 - 1
            fg = rng.rand(3).astype(np.float32) * 2 - 1
            # keep the colors separated so the object is actually visible
            while float(np.abs(fg - bg).max()) < 0.4:
                fg = rng.rand(3).astype(np.float32) * 2 - 1
            img = (bg + rng.randn(size, size, 3).astype(np.float32)
                   * rng.uniform(0.05, 0.3))
            obj = (fg + rng.randn(size, size, 3).astype(np.float32)
                   * rng.uniform(0.05, 0.3))
            img = np.where(target[..., None] > 0, obj, img)
            img = np.clip(img, -1.0, 1.0).astype(np.float32)
            xs.append(np.concatenate(
                [img, _box_channel(size, size, box)[..., None]], -1))
            ts.append(target)
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ts))
        )
        last = float(loss)
        if it % log_every == 0:
            log.warning("step %d loss %.4f", it, last)
    ckpt.save("segmenter_last", params=params, step=np.int64(steps - 1))
    return params, last


def load_backends(
    diffusion_ckpt: str,
    segmenter_ckpt: Optional[str] = None,
    image_hw: Tuple[int, int] = (256, 512),
    base: int = 64,
    segmenter_base: int = 32,
    steps: int = 50,
):
    """Rebuild the trained compact backends from their checkpoint directories
    (the ``diffusion_last`` / ``segmenter_last`` names this module saves) —
    the `--backend trainable` path of ``cgaug.generate.main``. ``image_hw``,
    ``base`` etc. must match the training call (the defaults match this
    module's defaults)."""
    from .diffusion import JaxSegDiffusion
    from .segmenter import JaxPromptableSegmenter

    diff_params = CheckpointManager(diffusion_ckpt).restore("diffusion_last")["params"]
    diffusion = JaxSegDiffusion(image_hw, params=diff_params, base=base,
                                steps=steps)
    segmenter = None
    if segmenter_ckpt:
        seg_params = CheckpointManager(segmenter_ckpt).restore(
            "segmenter_last")["params"]
        segmenter = JaxPromptableSegmenter(params=seg_params, base=segmenter_base)
    return diffusion, segmenter


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("which", choices=["diffusion", "segmenter"])
    parser.add_argument("--cityscapes_root", default="data/cityscapes")
    parser.add_argument("--mask_dir", default=None)
    parser.add_argument("--out", default="ckpts/cgaug")
    parser.add_argument("--steps", type=int, default=None)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    if args.which == "diffusion":
        train_diffusion(args.cityscapes_root, args.out,
                        steps=args.steps or 20000)
    else:
        train_segmenter(args.out, mask_dir=args.mask_dir,
                        steps=args.steps or 5000)


if __name__ == "__main__":
    main()
