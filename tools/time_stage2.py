"""M2F stage-2 training-step latency at the reference recipe geometry.

Builds the REAL trainer step (official SetCriterion + AdamW groups + clip,
``train/m2f_trainer.py::make_stage2_step``) on the full-scale model and times it
on synthetic data at crop 700^2 -> padded 704^2 — the measurement behind
PERF.md's stage-2 rows (1148 ms round 2; named-checkpoint remat round 3).

Usage: python tools/time_stage2.py [--batch 4] [--iters 10]
       python tools/time_stage2.py --cfg exps/m2f_swin_tiny.yaml   # swin recipes
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
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--crop", type=int, default=700)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cfg", default=None,
                    help="experiment yaml (default exps/m2f.yaml; pass a "
                         "m2f_swin_*.yaml to time the swin recipes)")
    args = ap.parse_args()

    from multishiftseg_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from multishiftseg_tpu.core.config import load_config
    from multishiftseg_tpu.core.mesh import replicated, shard_global_batch
    from multishiftseg_tpu.train.m2f_trainer import TrainM2FOOD
    from multishiftseg_tpu.train.state import (TrainState,
                                               build_m2f_official_optimizer)

    cfg_path = args.cfg or str(Path(__file__).parent.parent / "exps" / "m2f.yaml")
    cfg = load_config(cfg_path, exp_id="time_stage2")
    cfg.data.crop_size = (args.crop, args.crop)
    cfg.train.train_batch = args.batch // 2  # per-half
    trainer = TrainM2FOOD(cfg)

    m = cfg.model.m2f
    tx, opt_state = build_m2f_official_optimizer(
        trainer.variables["params"], base_lr=m.base_lr, weight_decay=m.weight_decay,
        clip_value=m.clip_gradients_value,
        trainable_names=cfg.model.trainable_params_name_update or (".",),
    )
    state = TrainState(
        params=trainer.variables["params"],
        batch_stats=trainer.variables.get("batch_stats"),
        opt_state=opt_state, step=jax.numpy.zeros((), jax.numpy.int32),
        rng=jax.random.PRNGKey(0),
    )
    state = jax.device_put(state, replicated(trainer.mesh))
    step_fn = trainer.make_stage2_step(tx)

    rng = np.random.RandomState(0)
    half = args.batch // 2
    img = rng.randn(half, args.crop, args.crop, 3).astype(np.float32)
    tgt = rng.randint(0, 19, (half, args.crop, args.crop)).astype(np.int32)
    tgt[:, :50, :50] = 254  # some OOD pixels so the ood losses are live
    ic, tc, _ = trainer._pad_batch(img, tgt)
    ig, tg, _ = trainer._pad_batch(img[::-1].copy(), tgt[::-1].copy())
    b = shard_global_batch((ic, ig, tc, tg), trainer.mesh)

    print("compiling...", flush=True)
    t0 = time.time()
    state, loss, _ = step_fn(state, *b)
    jax.block_until_ready(loss)
    print(f"compile+first step {time.time() - t0:.1f}s  loss={float(loss):.4f}",
          flush=True)

    t0 = time.time()
    for _ in range(args.iters):
        state, loss, _ = step_fn(state, *b)
    # host scalar read bounds the window: block_until_ready alone has been
    # observed to return early over this transport (bench.py discipline)
    float(loss)
    dt = (time.time() - t0) / args.iters
    print(f"stage-2 step: {dt * 1e3:.0f} ms  ({args.batch / dt:.2f} img/s/chip)",
          flush=True)


if __name__ == "__main__":
    main()
