"""DeepLab training-step latency at the reference recipe geometry.

Builds the REAL trainer step (``train/deeplab_trainer.py::make_train_step``) on the
full-scale WRN-38 model and times it on synthetic data at crop 700^2 — the
measurement behind PERF.md's DeepLab stage rows. ``--stage 1`` times the
post-warmup stage (aspp/bot_fine/bot_aspp/ood_head trainable).

Usage: python tools/time_deeplab.py [--batch 16] [--stage 0|1] [--iters 10]
(batch counts TOTAL images per step: batch//2 clean + batch//2 generated.)
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--crop", type=int, default=700)
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from multishiftseg_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from multishiftseg_tpu.core.config import load_config
    from multishiftseg_tpu.core.mesh import replicated, shard_global_batch
    from multishiftseg_tpu.train.deeplab_trainer import (TrainDeepLabOOD,
                                                         make_train_step)
    from multishiftseg_tpu.train.state import TrainState

    cfg = load_config(str(Path(__file__).parent.parent / "exps" / "deeplab.yaml"),
                      exp_id="time_deeplab")
    cfg.data.crop_size = (args.crop, args.crop)
    cfg.train.train_batch = args.batch // 2  # per-half
    trainer = TrainDeepLabOOD(cfg)

    tx, opt_state = trainer._stage_optimizer(args.stage)
    state = TrainState(
        params=trainer.variables["params"],
        batch_stats=trainer.variables.get("batch_stats"),
        opt_state=opt_state, step=jax.numpy.zeros((), jax.numpy.int32),
        rng=jax.random.PRNGKey(0),
    )
    state = jax.device_put(state, replicated(trainer.mesh))
    step_fn = make_train_step(trainer.model, tx, trainer.rcl_params)

    rng = np.random.RandomState(0)
    img = rng.randn(args.batch, args.crop, args.crop, 3).astype(np.float32)
    tgt = rng.randint(0, 19, (args.batch, args.crop, args.crop)).astype(np.int32)
    tgt[args.batch // 2:, :50, :50] = 254  # OOD pixels in the augmented half
    b = shard_global_batch((img, tgt), trainer.mesh)

    print("compiling...", flush=True)
    t0 = time.time()
    state, loss, _ = step_fn(state, *b)
    jax.block_until_ready(loss)
    print(f"compile+first step {time.time() - t0:.1f}s  loss={float(loss):.4f}",
          flush=True)

    t0 = time.time()
    for _ in range(args.iters):
        state, loss, _ = step_fn(state, *b)
    # host scalar read bounds the window (bench.py discipline)
    float(loss)
    dt = (time.time() - t0) / args.iters
    print(f"deeplab stage-{args.stage + 1} step: {dt * 1e3:.0f} ms  "
          f"({args.batch / dt:.2f} img/s/chip)", flush=True)


if __name__ == "__main__":
    main()
