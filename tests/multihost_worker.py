"""Worker process for the REAL multi-process multi-host test.

Launched by ``tests/test_multihost.py`` as N separate OS processes, each
joining a ``jax.distributed`` CPU cluster (gloo collectives) with its own
local devices — the first execution of the multi-host path with
``jax.process_count() > 1`` anywhere (SURVEY §2.9 DCN target; the wiring in
``core/mesh.py::make_global_mesh`` / ``shard_global_batch`` / the sharded
``Loader`` was previously only exercised single-process-degenerate).

Runs the actual ``TrainDeepLabOOD`` recipe (tiny trunk, synthetic data) and
dumps per-epoch losses + validation metrics + best to a JSON file, so the
parent test can assert loss equality with a single-process run of the same
global batch and that Orbax save/resume survives under >1 process.

Not collected by pytest (no ``test_`` prefix).
"""

import argparse
import json
import os
import sys


TINY_TRUNK = dict(
    trunk_structure=(1, 1, 1, 1, 1, 1),
    trunk_channels=((8, 8), (8, 8), (16, 16), (16, 16), (8, 16, 32), (16, 32, 64)),
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--port", type=int, default=12400)
    p.add_argument("--local_devices", type=int, default=2)
    p.add_argument("--cityscapes_root", required=True)
    p.add_argument("--generation_root", required=True)
    p.add_argument("--track_root", required=True)
    p.add_argument("--workdir", required=True)
    p.add_argument("--exp_id", default="mh")
    p.add_argument("--train_batch", type=int, default=4)
    p.add_argument("--n_epochs", type=int, default=2)
    p.add_argument("--warmup_epoch", type=int, default=-1)
    p.add_argument("--resume", default=None)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    # The site hook imports jax at interpreter startup (latching JAX_PLATFORMS
    # =axon), so env vars are too late — update the live config (conftest.py
    # does the same; backend init is lazy so this takes effect).
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.local_devices)
    if args.num_processes > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        assert jax.process_count() == args.num_processes

    os.chdir(args.workdir)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from multishiftseg_tpu.core.config import load_config
    from multishiftseg_tpu.models.deeplab import DeepWV3Plus
    from multishiftseg_tpu.train.deeplab_trainer import TrainDeepLabOOD

    cfg = load_config("/root/repo/exps/deeplab.yaml", exp_id=args.exp_id)
    cfg.data.cityscapes_root = args.cityscapes_root
    cfg.data.generation_root = args.generation_root
    cfg.data.anomaly_track_root = args.track_root
    cfg.data.coco_root = os.path.join(args.workdir, "nonexistent_coco")
    cfg.data.crop_size = (64, 64)
    cfg.data.num_workers = 2
    cfg.train.n_epochs = args.n_epochs
    cfg.train.warmup_epoch = args.warmup_epoch
    cfg.train.train_batch = args.train_batch
    cfg.train.bf16 = False
    cfg.loss.params["num_pair_samples"] = 256

    trainer = TrainDeepLabOOD(cfg, model=DeepWV3Plus(num_classes=19, **TINY_TRUNK))
    best = trainer.train(resume=args.resume)

    result = {
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "best": {k: float(v) for k, v in best.items()},
        "best_ckpt_exists": trainer.ckpt.exists("AUPRC_best"),
        "last_ckpt_exists": trainer.ckpt.exists("last"),
        "model_dir": cfg.model_dir,
    }
    scalars = os.path.join(cfg.model_dir, "scalars.csv")
    if os.path.exists(scalars):  # written by process 0 only
        from multishiftseg_tpu.core.logging import ScalarWriter

        w = ScalarWriter(cfg.model_dir)
        result["scalars"] = {k: v for k, v in w.read().items()}
        w.close()
    with open(args.out, "w") as f:
        json.dump(result, f)
    print(f"worker {args.process_id}/{args.num_processes} done: {result['best']}",
          flush=True)


if __name__ == "__main__":
    main()
