"""Host-side paired augmentation pipeline for (image, mask, gen_image, gen_mask).

Re-implements the behaviour of the reference transform library
(``lib/utils/img_utils.py:14-338``) on numpy/cv2 instead of torch/torchvision:
spatial transforms apply identical geometry to all four tensors; photometric
transforms touch both images but not the masks. ``Compose`` takes ``(aug, prob)``
pairs like the reference (``img_utils.py:27-51``).

Data convention: images are float32 HWC in [0, 1] until ``Normalize``; masks are
int32 HW. Randomness comes from a ``numpy.random.Generator`` passed through the
pipeline (reproducible, worker-seedable) rather than global ``random``.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple, Union

import cv2
import numpy as np


class Sample:
    """The 4-tuple the pipeline threads through (gen_* may be None for eval)."""

    __slots__ = ("image", "mask", "gen_image", "gen_mask")

    def __init__(self, image, mask, gen_image=None, gen_mask=None):
        self.image = image
        self.mask = mask
        self.gen_image = gen_image
        self.gen_mask = gen_mask

    def images(self):
        return [x for x in (self.image, self.gen_image) if x is not None]

    def map_images(self, fn):
        self.image = fn(self.image)
        if self.gen_image is not None:
            self.gen_image = fn(self.gen_image)
        return self

    def map_all(self, img_fn, mask_fn):
        self.image = img_fn(self.image)
        self.mask = mask_fn(self.mask)
        if self.gen_image is not None:
            self.gen_image = img_fn(self.gen_image)
            self.gen_mask = mask_fn(self.gen_mask)
        return self


class Compose:
    def __init__(self, augmentations: Sequence):
        self.augmentations = list(augmentations)

    def __call__(self, rng: np.random.Generator, sample: Sample) -> Sample:
        for a in self.augmentations:
            aug, prob = a if isinstance(a, (tuple, list)) else (a, 1.0)
            if rng.random() < prob:
                sample = aug(rng, sample)
        return sample


class ToTensor:
    """PIL/uint8 HWC -> float32 [0,1] HWC; masks -> int32."""

    def __call__(self, rng, s: Sample) -> Sample:
        def img(x):
            x = np.asarray(x)
            if x.dtype == np.uint8:
                # single fused pass (value-identical to astype(f32)/255.0:
                # the ufunc promotes then divides in f32)
                return np.divide(x, np.float32(255), dtype=np.float32)
            return x.astype(np.float32)

        def mask(m):
            return np.asarray(m).astype(np.int32)

        return s.map_all(img, mask)


class Normalize:
    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, rng, s: Sample) -> Sample:
        return s.map_images(lambda x: (x - self.mean) / self.std)


class ColorJitter:
    """brightness/contrast/saturation 0.8, hue 0.2 (reference img_utils.py:135-138),
    factors sampled and applied in random order, shared by both images."""

    def __init__(self, brightness=0.8, contrast=0.8, saturation=0.8, hue=0.2):
        self.b, self.c, self.s, self.h = brightness, contrast, saturation, hue

    def __call__(self, rng, s: Sample) -> Sample:
        fb = rng.uniform(max(0, 1 - self.b), 1 + self.b)
        fc = rng.uniform(max(0, 1 - self.c), 1 + self.c)
        fs = rng.uniform(max(0, 1 - self.s), 1 + self.s)
        fh = rng.uniform(-self.h, self.h)
        order = rng.permutation(4)

        def apply(x):
            for op in order:
                if op == 0:
                    x = np.clip(x * fb, 0, 1)
                elif op == 1:
                    gray = cv2.cvtColor((x * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
                    mean = gray.mean() / 255.0
                    x = np.clip(mean + fc * (x - mean), 0, 1)
                elif op == 2:
                    gray = cv2.cvtColor((x * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
                    g3 = (gray.astype(np.float32) / 255.0)[..., None]
                    x = np.clip(g3 + fs * (x - g3), 0, 1)
                else:
                    hsv = cv2.cvtColor((x * 255).astype(np.uint8), cv2.COLOR_RGB2HSV)
                    hsv = hsv.astype(np.int16)
                    hsv[..., 0] = (hsv[..., 0] + int(fh * 180)) % 180
                    x = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB).astype(
                        np.float32
                    ) / 255.0
            return x

        return s.map_images(apply)


class GaussianBlur:
    """kernel 9x9, sigma U(0.1, 5.0) (reference img_utils.py:141-144)."""

    def __call__(self, rng, s: Sample) -> Sample:
        sigma = rng.uniform(0.1, 5.0)
        return s.map_images(
            lambda x: cv2.GaussianBlur(x, (9, 9), sigmaX=sigma, sigmaY=sigma)
        )


class RandSharpness:
    """sharpness factor U(0, 2) (reference img_utils.py:189-196)."""

    def __call__(self, rng, s: Sample) -> Sample:
        f = rng.random() * 2

        def apply(x):
            blur = cv2.GaussianBlur(x, (3, 3), 0)
            return np.clip(blur + f * (x - blur), 0, 1)

        return s.map_images(apply)


class AutoContrast:
    def __call__(self, rng, s: Sample) -> Sample:
        def apply(x):
            out = np.empty_like(x)
            for c in range(x.shape[-1]):
                ch = x[..., c]
                lo, hi = ch.min(), ch.max()
                out[..., c] = (ch - lo) / (hi - lo) if hi > lo else ch
            return out

        return s.map_images(apply)


class Equalize:
    """Per-channel histogram equalization on uint8 (reference img_utils.py:205-218)."""

    def __call__(self, rng, s: Sample) -> Sample:
        def apply(x):
            u8 = (x * 255).astype(np.uint8)
            out = np.stack(
                [cv2.equalizeHist(u8[..., c]) for c in range(u8.shape[-1])], -1
            )
            return out.astype(np.float32) / 255.0

        return s.map_images(apply)


def _resize(img, size_hw, nearest=False):
    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    out = cv2.resize(img, (size_hw[1], size_hw[0]), interpolation=interp)
    return out


class Resize:
    def __init__(self, size: Tuple[int, int]):
        self.size = size

    def __call__(self, rng, s: Sample) -> Sample:
        return s.map_all(
            lambda x: _resize(x, self.size),
            lambda m: _resize(m, self.size, nearest=True),
        )


class RandResize:
    def __init__(self, scale: Sequence[float]):
        self.scale = list(scale)

    def __call__(self, rng, s: Sample) -> Sample:
        f = self.scale[rng.integers(len(self.scale))]
        h, w = s.image.shape[:2]
        size = (int(h * f), int(w * f))
        return s.map_all(
            lambda x: _resize(x, size), lambda m: _resize(m, size, nearest=True)
        )


class RandCrop:
    """Resize-if-small then one shared random crop (reference img_utils.py:246-259)."""

    def __init__(self, size: Tuple[int, int]):
        self.size = size

    def __call__(self, rng, s: Sample) -> Sample:
        th, tw = self.size
        h, w = s.image.shape[:2]
        if h < th or w < tw:
            s = s.map_all(
                lambda x: _resize(x, self.size),
                lambda m: _resize(m, self.size, nearest=True),
            )
            h, w = s.image.shape[:2]
        top = int(rng.integers(0, h - th + 1))
        left = int(rng.integers(0, w - tw + 1))
        return s.map_all(
            lambda x: x[top : top + th, left : left + tw],
            lambda m: m[top : top + th, left : left + tw],
        )


class RandCropIncludeOOD:
    """OOD-aware crop (reference img_utils.py:262-312): when the generated mask has
    anomaly pixels, bias the crop window to partially or fully include them;
    otherwise fall back to a plain shared random crop."""

    def __init__(self, size: Tuple[int, int], prob: float = 0.5):
        self.size = size
        self.prob = prob

    def __call__(self, rng, s: Sample) -> Sample:
        assert s.gen_mask is not None, "RandCropIncludeOOD needs the generated mask"
        th, tw = self.size
        h, w = s.image.shape[:2]
        if h < th or w < tw:
            s = s.map_all(
                lambda x: _resize(x, self.size),
                lambda m: _resize(m, self.size, nearest=True),
            )
            h, w = s.image.shape[:2]
        anomaly = (s.gen_mask > 100) & (s.gen_mask < 255)
        ys, xs = np.nonzero(anomaly)
        if ys.size == 0:
            top = int(rng.integers(0, h - th + 1))
            left = int(rng.integers(0, w - tw + 1))
        else:
            y_min, y_max = int(ys.min()), int(ys.max())
            x_min, x_max = int(xs.min()), int(xs.max())
            if rng.random() < self.prob:  # partially include the OOD object
                top_lo, top_hi = max(0, y_min - th + 1), min(y_max, h - th)
                left_lo, left_hi = max(0, x_min - tw + 1), min(x_max, w - tw)
            else:  # completely include it (assumes crop >= object)
                top_lo, top_hi = max(0, y_max - th + 1), min(y_min, h - th)
                left_lo, left_hi = max(0, x_max - tw + 1), min(x_min, w - tw)
            top = int(rng.integers(top_lo, max(top_lo, top_hi) + 1))
            left = int(rng.integers(left_lo, max(left_lo, left_hi) + 1))
        return s.map_all(
            lambda x: x[top : top + th, left : left + tw],
            lambda m: m[top : top + th, left : left + tw],
        )


class RandRotate:
    """Shared rotation U(-10, 10) deg; bilinear images, nearest masks
    (reference img_utils.py:315-323)."""

    def __call__(self, rng, s: Sample) -> Sample:
        angle = rng.random() * 20 - 10
        h, w = s.image.shape[:2]
        mat = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)

        def img(x):
            return cv2.warpAffine(x, mat, (w, h), flags=cv2.INTER_LINEAR)

        def mask(m):
            return cv2.warpAffine(
                m.astype(np.float32), mat, (w, h), flags=cv2.INTER_NEAREST
            ).astype(m.dtype)

        return s.map_all(img, mask)


class RandHorizontalFlip:
    def __call__(self, rng, s: Sample) -> Sample:
        return s.map_all(lambda x: x[:, ::-1].copy(), lambda m: m[:, ::-1].copy())


class RandVerticalFlip:
    def __call__(self, rng, s: Sample) -> Sample:
        return s.map_all(lambda x: x[::-1].copy(), lambda m: m[::-1].copy())
