"""End-to-end trainer throughput with the data pipeline under load.

PERF.md's training rows time the jitted step on pre-staged device arrays; this
tool answers the production question those numbers skip: does the HOST pipeline
(native PNG decode -> paired mixup -> shared-geometry crop -> normalize ->
anomaly-mix -> device feed) keep the chip fed at the reference recipe geometry?

It writes a synthetic full-resolution (1024x2048) Cityscapes layout to disk
(clean + generated pairs + labels, blocky noise so PNGs compress/decode like
natural images), then drives the REAL ``TrainDeepLabOOD.train`` loop — loader
workers, paired batches, RCL, checkpointing — and reports each epoch's img/s
as logged by the trainer (epoch 0 includes jit compile; later epochs are the
steady-state number to compare against the pure-step ceiling: 457 ms/step
stage 1 = 35.0 img/s, 543 ms stage 2 = 29.5 img/s at batch 16).

Usage: python tools/train_throughput.py [--images 96] [--epochs 3]
       [--batch 8] [--stage 1|2] [--workers 4] [--root /tmp/mss_tp]
"""

import argparse
import logging
import re
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def blocky(rng, h, w, block=16, channels=3):
    """Coarse noise kron-upsampled: compresses/decodes like a natural image
    (pure per-pixel noise makes PNG rows incompressible — an unrealistic
    decode-cost ceiling)."""
    coarse = rng.randint(0, 255, (h // block, w // block, channels), np.uint8)
    return np.kron(coarse, np.ones((block, block, 1), np.uint8))


def build_dataset(root: Path, n_images: int, h: int, w: int):
    from PIL import Image

    marker = root / f".done_{n_images}_{h}x{w}"
    if marker.exists():
        print(f"reusing dataset at {root}")
        return
    rng = np.random.RandomState(0)
    city = root / "cityscapes"
    gen = root / "DTWP"
    t0 = time.time()
    for i in range(n_images):
        stem = f"aachen_{i:06d}_000019"
        img_dir = city / "leftImg8bit" / "train" / "aachen"
        lab_dir = city / "gtFine" / "train" / "aachen"
        gimg_dir = gen / "leftImg8bit" / "train" / "aachen"
        glab_dir = gen / "gtFine" / "train" / "aachen"
        for d in (img_dir, lab_dir, gimg_dir, glab_dir):
            d.mkdir(parents=True, exist_ok=True)
        Image.fromarray(blocky(rng, h, w)).save(
            img_dir / f"{stem}_leftImg8bit.png")
        lab = (blocky(rng, h, w, 32, 1)[..., 0] % 19).astype(np.uint8)
        Image.fromarray(lab).save(lab_dir / f"{stem}_gtFine_labelTrainIds.png")
        Image.fromarray(blocky(rng, h, w)).save(
            gimg_dir / f"{stem}_gen0_leftImg8bit.png")
        glab = lab.copy()
        glab[256:512, 256:768] = 254  # semantic-shift region
        Image.fromarray(glab).save(
            glab_dir / f"{stem}_gen0_gtFine_labelTrainIds.png")
    # tiny val track so per-epoch valid() stays negligible
    track = root / "anomaly_track"
    (track / "images").mkdir(parents=True, exist_ok=True)
    (track / "labels_masks").mkdir(parents=True, exist_ok=True)
    for i in range(2):
        Image.fromarray(blocky(rng, 128, 256)).save(
            track / "images" / f"val{i}.jpg")
        vlab = np.zeros((128, 256), np.uint8)
        vlab[40:80, 60:120] = 1
        Image.fromarray(vlab).save(
            track / "labels_masks" / f"val{i}_labels_semantic.png")
    marker.touch()
    print(f"dataset built in {time.time() - t0:.1f}s "
          f"({n_images} x {h}x{w} clean+gen pairs)")


class _EpochRateCapture(logging.Handler):
    """Collect the trainer's per-epoch '(X img/s)' log values."""

    def __init__(self):
        super().__init__()
        self.rates = []

    def emit(self, record):
        m = re.search(r"\(([\d.]+) img/s\)", record.getMessage())
        if m:
            self.rates.append(float(m.group(1)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8, help="per-half batch rows")
    ap.add_argument("--stage", type=int, default=1, choices=[1, 2],
                    help="1 = ood_head-only warmup recipe, 2 = wider unfreeze")
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--size", default="1024x2048")
    ap.add_argument("--root", default="/tmp/mss_train_throughput")
    args = ap.parse_args()

    h, w = (int(x) for x in args.size.split("x"))
    root = Path(args.root)
    build_dataset(root, args.images, h, w)

    from multishiftseg_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from multishiftseg_tpu.core.config import load_config
    from multishiftseg_tpu.train.deeplab_trainer import TrainDeepLabOOD

    cfg = load_config(str(Path(__file__).parent.parent / "exps" / "deeplab.yaml"),
                      exp_id="train_throughput")
    cfg.data.cityscapes_root = str(root / "cityscapes")
    cfg.data.generation_root = str(root / "DTWP")
    cfg.data.anomaly_track_root = str(root / "anomaly_track")
    cfg.data.coco_root = str(root / "no_coco")  # anomaly-mix bank absent: skipped
    cfg.data.num_workers = args.workers
    cfg.train.train_batch = args.batch
    cfg.train.n_epochs = args.epochs
    # stage 1: never cross the boundary; stage 2: start past it
    cfg.train.warmup_epoch = args.epochs + 1 if args.stage == 1 else 0

    cap = _EpochRateCapture()
    logging.basicConfig(level=logging.INFO, format="[%(asctime)s] %(message)s")
    logging.getLogger("multishiftseg_tpu.train.deeplab_trainer").addHandler(cap)

    trainer = TrainDeepLabOOD(cfg)
    t0 = time.time()
    trainer.train()
    wall = time.time() - t0

    steady = cap.rates[1:] or cap.rates
    step_ceiling = 35.0 if args.stage == 1 else 29.5  # PERF.md pure-step rates
    print(f"\nepoch img/s: {cap.rates}")
    if steady:
        print(f"steady-state (excl. compile epoch): {max(steady):.1f} img/s "
              f"= {max(steady) / step_ceiling:.2f}x the pure-step ceiling "
              f"({step_ceiling} img/s, PERF.md stage {args.stage})")
    print(f"total wall {wall:.0f}s for {args.epochs} epochs x "
          f"{args.images} pairs (batch {2 * args.batch}/step incl. aug half)")


if __name__ == "__main__":
    main()
