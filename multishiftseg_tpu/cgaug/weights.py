"""Pretrained-weight fetching for the CG-Aug pipeline and the OOD models.

Equivalent of ``CGAug/download.py:1-35`` (wget + gdown + hf_hub) with one plain
``urllib`` path and a name registry. The reference's three CG-Aug assets plus the
released model checkpoints named by its README are listed; google-drive-hosted
files cannot be fetched without an interactive session and raise with the manual
URL instead.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from ..utils import download_checkpoint

# name -> (url, filename); gdrive: prefix means no direct download
WEIGHT_URLS: Dict[str, tuple] = {
    # SAM ViT-H for generation-quality filtering (CGAug/download.py:7)
    "sam_vit_h": (
        "https://dl.fbaipublicfiles.com/segment_anything/sam_vit_h_4b8939.pth",
        "sam_vit_h_4b8939.pth",
    ),
    # ControlNet seg-conditioned SD 1.5 (CGAug/download.py:27-33)
    "control_sd15_seg": (
        "https://huggingface.co/lllyasviel/ControlNet/resolve/main/models/"
        "control_sd15_seg.pth",
        "control_sd15_seg.pth",
    ),
    # Mask2Anomaly Barlow-Twins R-50 init for M2F fine-tuning (README.md:120-122)
    "bt-f-xl": (
        "gdrive:1UVms08chnBkZta_cNumjiei6GByyM9VN",
        "bt-f-xl.pth",
    ),
    # the RELEASED fine-tuned checkpoints behind the README benchmark table
    # (README.md:140-146, Hugging Face mirrors of the gdrive links) — consumed
    # by tools/validate_release.py for the ±0.5-pt accuracy-parity check
    "deeplab_best": (
        "https://huggingface.co/Cuttle-fish-my/MultiShiftSeg/resolve/main/"
        "DeepLab_best.pth",
        "DeepLab_best.pth",
    ),
    "m2f_best": (
        "https://huggingface.co/Cuttle-fish-my/MultiShiftSeg/resolve/main/"
        "M2F_best.pth",
        "M2F_best.pth",
    ),
    # Swin IN21k pretrains for the swin experiment configs
    "swin_large_22k": (
        "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/"
        "swin_large_patch4_window12_384_22k.pth",
        "swin_large_patch4_window12_384_22k.pth",
    ),
    "swin_tiny_1k": (
        "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/"
        "swin_tiny_patch4_window7_224.pth",
        "swin_tiny_patch4_window7_224.pth",
    ),
    # CLIP BPE tokenizer assets for the SD text conditioning (FrozenCLIPEmbedder
    # uses openai/clip-vit-large-patch14; vocab/merges are model-agnostic)
    "clip_vocab": (
        "https://huggingface.co/openai/clip-vit-large-patch14/resolve/main/vocab.json",
        "clip/vocab.json",
    ),
    "clip_merges": (
        "https://huggingface.co/openai/clip-vit-large-patch14/resolve/main/merges.txt",
        "clip/merges.txt",
    ),
}


def build_real_backends(download_dir: str = "pretrained_model"):
    """Assemble the reference-parity CG-Aug backends from fetched weights:
    (SDControlNetGenerator over control_sd15_seg.pth, SAMSegmenter over
    sam_vit_h_4b8939.pth) — drop-in for MultiShiftGenerator's diffusion and
    segmenter protocol slots (the reference's exact generation stack,
    generate_multishift_image.py:44-58, running natively on TPU)."""
    from ..convert.sam import load_sam
    from ..convert.sd_controlnet import load_control_sd15
    from .clip_text import load_tokenizer
    from .sam import SAMSegmenter, sam_vit_h
    from .sd_pipeline import SDControlNetGenerator

    sd_params = load_control_sd15(fetch_weight("control_sd15_seg", download_dir))
    fetch_weight("clip_vocab", download_dir)
    fetch_weight("clip_merges", download_dir)
    tok = load_tokenizer(os.path.join(download_dir, "clip"))
    gen = SDControlNetGenerator(sd_params, tok)
    seg = SAMSegmenter(load_sam(fetch_weight("sam_vit_h", download_dir)), sam_vit_h())
    return gen, seg


def fetch_weight(name: str, download_dir: str = "pretrained_model") -> str:
    """Download (if absent) and return the local path of a registered weight."""
    url, filename = WEIGHT_URLS[name]
    dest = os.path.join(download_dir, filename)
    if os.path.isfile(dest):
        return dest
    if url.startswith("gdrive:"):
        raise RuntimeError(
            f"{name} is hosted on Google Drive (id {url[7:]}) and needs a manual "
            f"download to {dest} (the reference uses gdown, CGAug/download.py:19-22)"
        )
    return download_checkpoint(url, dest)


def fetch_all(download_dir: str = "pretrained_model",
              skip_manual: bool = True) -> Dict[str, Optional[str]]:
    """Fetch every registered weight; gdrive-hosted ones map to None when
    ``skip_manual`` (the reference script's behaviour minus gdown)."""
    out: Dict[str, Optional[str]] = {}
    for name in WEIGHT_URLS:
        try:
            out[name] = fetch_weight(name, download_dir)
        except RuntimeError:
            if not skip_manual:
                raise
            out[name] = None
    return out


if __name__ == "__main__":
    for k, v in fetch_all().items():
        print(f"{k}: {v or 'MANUAL DOWNLOAD REQUIRED'}")
