"""PEBAL-style anomaly mix: paste a random scaled COCO OOD object into the image with
label 254, plus the clean/generated mixup blend.

Behavioural port of the reference helpers (``lib/utils/img_utils.py:345-435`` and the
mixup in ``lib/dataset/cityscapes.py:160-163``).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import cv2
import numpy as np
from PIL import Image

IMAGENET_MEAN = np.asarray((0.485, 0.456, 0.406), np.float32)
IMAGENET_STD = np.asarray((0.229, 0.224, 0.225), np.float32)


def random_scale(img: np.ndarray, gt: np.ndarray, scales: Sequence[float],
                 rng: np.random.Generator):
    scale = scales[rng.integers(len(scales))]
    sh, sw = int(img.shape[0] * scale), int(img.shape[1] * scale)
    img = cv2.resize(img, (sw, sh), interpolation=cv2.INTER_LINEAR)
    gt = cv2.resize(gt, (sw, sh), interpolation=cv2.INTER_NEAREST)
    return img, gt


def mix_object(
    image: np.ndarray,  # HWC float32 (normalized or [0,1])
    mask: np.ndarray,  # HW int
    cut_img: np.ndarray,  # HWC float32 raw 0-255
    cut_mask: np.ndarray,  # HW uint8; nonzero & !=255 = object (values carry labels)
    rng: np.random.Generator,
    normalized: bool = True,
):
    """Bbox-crop the cut object and paste pixels + label values at a random location
    (reference ``mix_func``, img_utils.py:396-435)."""
    obj = (cut_mask != 0) & (cut_mask != 255)
    ys, xs = np.where(obj)
    if ys.size == 0:
        return image, mask
    y1, y2 = ys.min(), ys.max() + 1
    x1, x2 = xs.min(), xs.max() + 1
    cut_mask = cut_mask[y1:y2, x1:x2]
    cut_img = cut_img[y1:y2, x1:x2]
    ch, cw = cut_mask.shape
    if ch > mask.shape[0] or cw > mask.shape[1]:
        return image, mask

    if normalized:
        cut_img = (cut_img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD

    hs = int(rng.integers(0, mask.shape[0] - ch + 1))
    ws = int(rng.integers(0, mask.shape[1] - cw + 1))
    sel = (cut_mask != 0) & (cut_mask != 255)
    region_img = image[hs : hs + ch, ws : ws + cw]
    region_mask = mask[hs : hs + ch, ws : ws + cw]
    region_img[sel] = cut_img[sel]
    region_mask[sel] = cut_mask[sel]
    return image, mask


def paste_coco_objects(
    image: np.ndarray,
    mask: np.ndarray,
    coco_images: List[str],
    coco_targets: List[str],
    ood_scale_array: Sequence[float],
    rng: np.random.Generator,
):
    """Pick a random COCO cut-out, scale it, paste into the (normalized) clean image
    (reference ``paste_coco_objects``, img_utils.py:367-377)."""
    idx = int(rng.integers(len(coco_images)))
    ood_image = np.asarray(Image.open(coco_images[idx]).convert("RGB"), np.float32)
    ood_target = np.asarray(Image.open(coco_targets[idx]).convert("L"), np.uint8)
    scaled_img, scaled_gt = random_scale(ood_image, ood_target, ood_scale_array, rng)
    return mix_object(image, mask, scaled_img, scaled_gt, rng)


def mixup_generated(
    image: np.ndarray, gen_image: np.ndarray, rng: np.random.Generator,
    max_coeff: float = 0.3,
) -> np.ndarray:
    """Blend the clean image into the generated one with coefficient
    min(U(0,1), 0.3) (reference cityscapes.py:160-163). uint8 in/out.

    Value-identical to ``(p*image.astype(f32) + (1-p)*gen.astype(f32)).astype(u8)``
    but with one temporary instead of three full-resolution ones — this runs
    per sample on 2MP images in the loader's hot path."""
    p = min(rng.random(), max_coeff)
    out = np.multiply(image, p, dtype=np.float32)
    out += np.multiply(gen_image, 1 - p, dtype=np.float32)
    return out.astype(np.uint8)
