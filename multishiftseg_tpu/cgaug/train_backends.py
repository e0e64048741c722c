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
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp
import optax

from ..train.checkpoint import CheckpointManager
from .diffusion import SegCondUNet, hash_prompt, make_diffusion_train_step
from .label_ops import cityscapes_to_ade20k
from .palettes import ade20k_color
from .segmenter import PromptUNet, _box_channel, make_segmenter_train_step

log = logging.getLogger(__name__)

# ADE20K object classes pasted as training-time anomalies (aligned with
# ``ade20k_source.DEFAULT_OOD_CLASSES``; a compact subset is enough — the point
# is that the model learns "non-scene saturated label color -> render a salient
# object there", which generalizes across the palette).
DEFAULT_PASTE_CLASSES = (
    "sofa", "box", "chair", "animal", "bench", "barrel", "bag", "ball",
    "bottle", "boat", "bicycle", "television receiver",
)


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


def _load_pair_u8(img_path: str, lbl_path: str, hw: Tuple[int, int],
                  ade: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """(image, color label) as uint8 arrays; ``ade`` remaps the label into the
    ADE20K palette — the palette ``MultiShiftGenerator.generate`` conditions on
    at generation time (it calls ``cityscapes_to_ade20k`` before sampling), so
    training MUST condition on the same colors or the model sees an unseen
    palette at generation. Colors outside the Cityscapes palette (e.g. pasted
    ADE anomaly classes) pass through the remap untouched."""
    h, w = hw
    img = Image.open(img_path).convert("RGB").resize((w, h), Image.BILINEAR)
    lbl = Image.open(lbl_path).convert("RGB").resize((w, h), Image.NEAREST)
    lbl_u8 = np.asarray(lbl, np.uint8)
    if ade:
        lbl_u8, _ = cityscapes_to_ade20k(lbl_u8)
    return np.asarray(img, np.uint8), lbl_u8


def _walk_coco_bank(coco_root: str) -> Tuple[List[str], List[str]]:
    """The COCO OOD cut-out bank layout ``DiverseCityscapes`` indexes
    (``data/cityscapes.py``): mask pngs under
    ``annotations/oodclass_nocrowd_seg_train2017``, RGB under ``train2017``."""
    images, targets = [], []
    tdir = os.path.join(coco_root, "annotations", "oodclass_nocrowd_seg_train2017")
    idir = os.path.join(coco_root, "train2017")
    for r, _, filenames in os.walk(tdir):
        for f in sorted(filenames):
            if f.endswith(".png"):
                targets.append(os.path.join(r, f))
                images.append(os.path.join(idir, f.replace(".png", ".jpg")))
    return images, targets


def _paste_training_anomaly(
    img_u8: np.ndarray,
    lbl_u8: np.ndarray,
    cut_img: np.ndarray,
    cut_mask: np.ndarray,
    ade_rgb: np.ndarray,
    rng: np.random.RandomState,
) -> None:
    """Composite an object cut-out into a training pair IN PLACE: RGB pixels
    into the image, its ADE20K class color into the label.

    This is the trainable backend's stand-in for the pretrained knowledge the
    reference's frozen SD1.5+ControlNet carries: at generation time
    ``paste_anomaly`` writes an ADE object color into the label and the
    diffusion must render a visible object there
    (``CGAug/generate_multishift_image.py:145-184`` filters on exactly that
    visibility via SAM box-IoU). A model trained only on anomaly-free scenes
    has never seen those label colors and renders the region indistinctly —
    so train with the paste. Placement prefers road pixels (the
    generation-time paste is road-constrained, ``label_ops.paste_on_road``)."""
    obj = (cut_mask != 0) & (cut_mask != 255)
    ys, xs = np.where(obj)
    if ys.size == 0:
        return
    crop_m = obj[ys.min():ys.max() + 1, xs.min():xs.max() + 1]
    crop_i = cut_img[ys.min():ys.max() + 1, xs.min():xs.max() + 1]
    h, w = lbl_u8.shape[:2]
    short = min(h, w)
    target = int(rng.randint(max(short // 5, 8), max(short // 2, 9)))
    sc = target / max(crop_m.shape)
    nh = min(max(int(crop_m.shape[0] * sc), 2), h)
    nw = min(max(int(crop_m.shape[1] * sc), 2), w)
    crop_m = cv2.resize(crop_m.astype(np.uint8), (nw, nh),
                        interpolation=cv2.INTER_NEAREST).astype(bool)
    crop_i = cv2.resize(crop_i, (nw, nh), interpolation=cv2.INTER_LINEAR)

    road = np.all(lbl_u8 == ade20k_color("road"), axis=-1)
    road[: nh // 2] = False  # keep the paste inside the frame top
    coords = np.column_stack(np.where(road))
    if len(coords):
        cy, cx = coords[int(rng.randint(len(coords)))]
    else:
        cy, cx = rng.randint(0, h), rng.randint(0, w)
    y0 = min(max(cy - nh // 2, 0), h - nh)
    x0 = min(max(cx - nw // 2, 0), w - nw)
    img_u8[y0:y0 + nh, x0:x0 + nw][crop_m] = crop_i[crop_m]
    lbl_u8[y0:y0 + nh, x0:x0 + nw][crop_m] = ade_rgb


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
    ade_condition: bool = True,
    coco_root: Optional[str] = None,
    paste_bank: Optional[Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]]] = None,
    paste_prob: float = 0.5,
    paste_classes: Sequence[str] = DEFAULT_PASTE_CLASSES,
    cache_limit: int = 512,
):
    """``ade_condition`` trains on the ADE20K-remapped palette the generator
    conditions on (see ``_load_pair_u8``). ``coco_root`` enables the anomaly
    paste augmentation (see ``_paste_training_anomaly``): with probability
    ``paste_prob`` per sample, an object cut-out from the COCO OOD bank is
    composited into both the image and (as an ADE class color) the label.
    ``paste_bank`` feeds the same augmentation from in-memory
    ``(cut_img_u8, cut_mask_u8, ade_rgb_u8)`` tuples instead of a COCO layout
    (used by ``tools/cgaug_quality_eval.py``, which has no photo bank offline)."""
    pairs = walk_color_pairs(cityscapes_root)
    if not pairs:
        raise FileNotFoundError(f"no (image, color label) pairs under {cityscapes_root}")
    bank: Tuple[List[str], List[str]] = ([], [])
    if coco_root:
        bank = _walk_coco_bank(coco_root)
        if not bank[0]:
            raise FileNotFoundError(f"no COCO cut-out bank under {coco_root}")
    log.warning("diffusion: %d pairs, %d steps @ batch %d (ade=%s, bank=%d+%d)",
                len(pairs), steps, batch, ade_condition, len(bank[0]),
                len(paste_bank or ()))

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
    cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}

    def get_pair(i: int) -> Tuple[np.ndarray, np.ndarray]:
        if i in cache:
            img, lbl = cache[i]
        else:
            img, lbl = _load_pair_u8(*pairs[i], image_hw, ade=ade_condition)
            if len(pairs) <= cache_limit:
                cache[i] = (img, lbl)
        if (bank[0] or paste_bank) and rng.rand() < paste_prob:
            img, lbl = img.copy(), lbl.copy()
            if paste_bank:
                cut_img, cut_mask, rgb = paste_bank[rng.randint(len(paste_bank))]
            else:
                j = rng.randint(len(bank[0]))
                cut_img = np.asarray(Image.open(bank[0][j]).convert("RGB"), np.uint8)
                cut_mask = np.asarray(Image.open(bank[1][j]).convert("L"), np.uint8)
                rgb = ade20k_color(paste_classes[rng.randint(len(paste_classes))])
            _paste_training_anomaly(img, lbl, cut_img, cut_mask, rgb, rng)
        return (img.astype(np.float32) / 127.5 - 1.0,
                lbl.astype(np.float32) / 127.5 - 1.0)

    t0, last = time.time(), 0.0
    for it in range(steps):
        sel = rng.randint(0, len(pairs), batch)
        imgs, lbls = zip(*[get_pair(i) for i in sel])
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

    Two further scene realities, learned round 4: backgrounds are horizontal
    BANDS (road scenes are sky/building/road strata, each its own color), and
    0-2 DISTRACTOR objects are composited that the target mask excludes —
    without them "segment anything salient anywhere" solves the training task,
    and at filter time the segmenter grabs scene objects adjacent to the box
    (measured: IoU 0.47-0.62 rejections with a clearly-rendered anomaly).
    Distractors force actual box conditioning — SAM's prompt semantics.
    """
    masks: List[np.ndarray] = []
    if mask_dir:
        for p in sorted(glob.glob(os.path.join(mask_dir, "**", "*.png"),
                                  recursive=True))[:2000]:
            m = np.asarray(Image.open(p).convert("L")) > 127
            if m.any():
                masks.append(m.astype(np.float32))
        log.warning("segmenter: %d object masks", len(masks))

    def rand_shape(rng: np.random.RandomState) -> np.ndarray:
        """A full-canvas binary shape: a scaled real mask or a rectangle."""
        canvas = np.zeros((size, size), np.float32)
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
            canvas[y0:y0 + nh, x0:x0 + nw] = crop
        else:
            x0, y0 = rng.randint(0, size - 8, 2)
            x1 = x0 + rng.randint(4, size - x0 + 1)
            y1 = y0 + rng.randint(4, size - y0 + 1)
            canvas[y0:y1, x0:x1] = 1.0
        return canvas

    def rand_color(rng, away_from=(), min_sep: float = 0.4) -> np.ndarray:
        c = rng.rand(3).astype(np.float32) * 2 - 1
        while any(float(np.abs(c - a).max()) < min_sep for a in away_from):
            c = rng.rand(3).astype(np.float32) * 2 - 1
        return c

    model = PromptUNet(base=base)
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(seed)}, jnp.zeros((1, size, size, 4))
    )["params"]
    tx = optax.adam(optax.cosine_decay_schedule(lr, max(steps, 1), alpha=0.05))
    opt_state = tx.init(params)
    step_fn = make_segmenter_train_step(model, tx)
    ckpt = CheckpointManager(out_dir)
    rng = np.random.RandomState(seed)
    last = 0.0
    for it in range(steps):
        xs, ts = [], []
        for _ in range(batch):
            target = rand_shape(rng)
            ys, xs_ = np.where(target > 0)
            box = np.asarray([xs_.min(), ys.min(), xs_.max(), ys.max()])
            # banded background (road scenes are horizontal strata)
            n_bands = rng.randint(1, 4)
            edges = sorted(rng.randint(1, size, n_bands - 1)) if n_bands > 1 else []
            band_cols = []
            img = np.zeros((size, size, 3), np.float32)
            y_prev = 0
            for e in list(edges) + [size]:
                c = rand_color(rng, band_cols, min_sep=0.0)
                band_cols.append(c)
                img[y_prev:e] = c
                y_prev = e
            img += (rng.randn(size, size, 3).astype(np.float32)
                    * rng.uniform(0.05, 0.3))
            fg = rand_color(rng, band_cols)
            # 0-2 distractor objects the target mask EXCLUDES (painted under
            # the target) — separated from the fg so the task stays learnable
            for _ in range(rng.randint(0, 3)):
                dm = rand_shape(rng)
                dcol = rand_color(rng, [fg], min_sep=0.3)
                dobj = (dcol + rng.randn(size, size, 3).astype(np.float32)
                        * rng.uniform(0.05, 0.3))
                img = np.where(dm[..., None] > 0, dobj, img)
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
    parser.add_argument("--coco_root", default=None,
                        help="COCO OOD cut-out bank root: enables the anomaly "
                             "paste augmentation for the diffusion backend")
    parser.add_argument("--paste_prob", type=float, default=0.5)
    parser.add_argument("--no_ade", action="store_true",
                        help="condition on raw Cityscapes colors instead of "
                             "the ADE20K remap the generator feeds")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    if args.which == "diffusion":
        train_diffusion(args.cityscapes_root, args.out,
                        steps=args.steps or 20000,
                        ade_condition=not args.no_ade,
                        coco_root=args.coco_root,
                        paste_prob=args.paste_prob)
    else:
        train_segmenter(args.out, mask_dir=args.mask_dir,
                        steps=args.steps or 5000)


if __name__ == "__main__":
    main()
