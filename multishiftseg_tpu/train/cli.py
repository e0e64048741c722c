"""Training CLI — the TPU-native ``train_deeplab.py`` / ``train_m2f.py`` entry points.

  python -m multishiftseg_tpu.train.cli --model deeplab --cfg exps/deeplab.yaml \
      --id exp0 --weight_path pretrained.pth [--run train]
"""

from __future__ import annotations

import argparse
import logging
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", choices=["deeplab", "m2f"], required=True)
    parser.add_argument("--cfg", default=None, help="experiment yaml")
    parser.add_argument("--id", default="exp", help="experiment id")
    parser.add_argument("--weight_path", default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--run", default="train")
    parser.add_argument("--start_epoch", type=int, default=0)
    parser.add_argument("--resume", default=None,
                        help="checkpoint name to resume from (e.g. AUPRC_best)")
    args = parser.parse_args()

    from ..core.config import load_config
    from ..core.mesh import initialize_distributed
    from ..utils import enable_compilation_cache

    enable_compilation_cache()  # full-scale programs take minutes to compile
    initialize_distributed()  # no-op single-process; joins a pod when launched multi-host
    cfg = load_config(args.cfg, args.id)
    cfg.train.seed = args.seed

    os.makedirs(cfg.log_dir, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s] %(message)s",
        handlers=[
            logging.FileHandler(os.path.join(cfg.log_dir, "log.txt")),
            logging.StreamHandler(),
        ],
    )

    if args.model == "deeplab":
        from .deeplab_trainer import TrainDeepLabOOD as Trainer
    elif (cfg.model.m2f.instance_on or cfg.model.m2f.panoptic_on
          or not cfg.model.m2f.ood_finetune):
        # the vanilla config family (semantic with ood_finetune off, instance,
        # panoptic) routes to the per-segment-target trainer (no OOD machinery)
        from .instance_trainer import TrainM2FInstance as Trainer
    else:
        from .m2f_trainer import TrainM2FOOD as Trainer

    trainer = Trainer(cfg, weight_path=args.weight_path)
    run_fn = getattr(trainer, args.run)
    if args.run == "train":
        kwargs = {"start_epoch": args.start_epoch}
        if args.resume:
            kwargs["resume"] = args.resume
        result = run_fn(**kwargs)
    else:
        result = run_fn()
    logging.warning("done: %s", result)


if __name__ == "__main__":
    main()
