"""DeepLab OOD fine-tuning trainer — the TPU-native ``TrainDeepLabOOD``.

Re-implements the behaviour of ``train_deeplab.py:24-351``: paired-batch training
(clean ‖ augmented concatenated on the leading axis), two-stage trainable-parameter
schedule (``ood_head`` only for ``warmup_epoch`` epochs, then
``aspp/bot_fine/bot_aspp/ood_head`` at a lower lr with a fresh optimizer), per-epoch
validation on RoadAnomaly21, best-AUPRC checkpointing.

TPU design: one jitted ``train_step`` per stage (donated state), batch sharded over the
``data`` mesh axis (the DataParallel replacement — gradients all-reduce over ICI under
jit), BatchNorm statistics computed over the global batch, Orbax checkpoints of
params + optimizer state + PRNG + epoch (the reference only saved params).
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..core.logging import ScalarWriter
from ..core.mesh import (
    make_train_mesh, place_train_state, shard_batch, shard_global_batch,
)
from ..data.anomaly import RoadAnomaly21
from ..data.cityscapes import DiverseCityscapes
from ..data.loader import Loader
from ..data.transforms import Compose, Normalize, RandCrop, ToTensor
from ..losses.rcl import RCLParams, make_rcl_params, rel_contrastive_loss
from ..models.deeplab import DeepWV3Plus, init_ood_head_from_final
from .checkpoint import CheckpointManager
from .state import TrainState, build_stage_optimizer

log = logging.getLogger(__name__)


def make_train_step(model: DeepWV3Plus, tx, rcl_params: RCLParams,
                    paired: bool = False):
    """Jitted paired-batch train step. batch = (img [2B,H,W,3], target [2B,H,W]).

    With ``paired=True`` the step takes the clean and generated halves as FOUR
    separate arrays and concatenates them inside jit: under a multi-host mesh each
    host feeds only its local slice of each half (``local_batch_slice``), and the
    in-jit concat reassembles the global [clean ‖ augmented] order the RCL loss
    splits at (a host-side concat would interleave the halves per host)."""

    def train_step(state: TrainState, img, target):
        rng, step_rng, drop_rng = jax.random.split(state.rng, 3)

        def loss_fn(params):
            (score, logit), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                img,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": drop_rng},
            )
            loss, aux = rel_contrastive_loss(logit, score, target, step_rng, rcl_params)
            return loss, (updates["batch_stats"], aux)

        (loss, (new_stats, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        new_state = TrainState(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            step=state.step + 1, rng=rng,
        )
        return new_state, loss, aux

    if paired:

        @functools.partial(jax.jit, donate_argnums=(0,))
        def paired_step(state, img_c, img_g, tgt_c, tgt_g):
            return train_step(
                state,
                jnp.concatenate([img_c, img_g], 0),
                jnp.concatenate([tgt_c, tgt_g], 0),
            )

        return paired_step
    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model: DeepWV3Plus):
    @jax.jit
    def eval_step(variables, img):
        return model.apply(variables, img, train=False)

    return eval_step


class TrainDeepLabOOD:
    """Two-stage DeepLab OOD fine-tuning driver."""

    def __init__(self, cfg: Config, weight_path: Optional[str] = None,
                 model: Optional[DeepWV3Plus] = None):
        self.cfg = cfg
        # single-process: halves concatenated on host, data axis fits 2B rows;
        # multi-process: host-major global mesh, halves fed as separate global
        # arrays (in-jit concat), data axis must divide ONE half (core.mesh)
        self.mesh = make_train_mesh(cfg.train.train_batch, cfg.train.num_devices,
                                    cfg.train.model_parallel)
        if cfg.train.train_batch % jax.process_count() != 0:
            raise ValueError(
                f"train_batch {cfg.train.train_batch} not divisible by "
                f"{jax.process_count()} hosts"
            )
        self.local_batch = cfg.train.train_batch // jax.process_count()
        self.model = model or DeepWV3Plus(
            num_classes=cfg.data.class_num,
            dtype=jnp.bfloat16 if cfg.train.bf16 else None,
        )
        self.rcl_params = make_rcl_params(cfg.loss.params)
        self.best: Dict[str, float] = {"AUPRC": -1.0}
        self.ckpt = CheckpointManager(cfg.model_dir)
        self.variables = self._build_variables(weight_path)
        self.eval_step = make_eval_step(self.model)

    # ---------------- setup ----------------

    def _build_variables(self, weight_path: Optional[str]):
        if weight_path:
            from ..convert.torch2jax import convert_deeplab, load_torch_checkpoint

            log.info("loading torch checkpoint %s", weight_path)
            variables = convert_deeplab(load_torch_checkpoint(weight_path))
            variables["params"] = init_ood_head_from_final(variables["params"])
            return jax.tree_util.tree_map(jnp.asarray, variables)
        log.warning("no weight_path given; training from random init")
        rng = jax.random.PRNGKey(self.cfg.train.seed)
        h, w = self.cfg.data.crop_size
        return jax.jit(self.model.init, static_argnames=("train",))(
            {"params": rng}, jnp.zeros((1, h, w, 3), jnp.float32), train=False
        )

    def build_datasets(self):
        d = self.cfg.data
        # Crop FIRST: RandCrop is a pure pixel selection at this recipe's
        # geometry (2048x1024 images >> 700^2 crops, so its resize-if-small
        # branch never fires), and ToTensor/Normalize are pixel-wise — the
        # composition is value-identical to the reference order
        # [ToTensor, RandCrop, Normalize] while running the float conversion
        # on 0.49MP crops instead of 2MP full frames (the loader's host cost
        # dominates a 1-core feeder; see PERF.md host-pipeline section).
        train_tf = Compose([
            RandCrop(size=tuple(d.crop_size)),
            ToTensor(),
            Normalize(mean=d.mean, std=d.std),
        ])
        test_tf = Compose([ToTensor(), Normalize(mean=d.mean, std=d.std)])
        train_ds = DiverseCityscapes(
            root=d.cityscapes_root, generation_root=d.generation_root,
            coco_root=d.coco_root, split="train", transform=train_tf,
            anomaly_mix=d.anomaly_mix, mixup=d.mixup, seed=self.cfg.train.seed,
        )
        val_ds = RoadAnomaly21(root=d.anomaly_track_root, transform=test_tf)
        return train_ds, val_ds

    def _stage_optimizer(self, stage: int):
        m = self.cfg.model
        t = self.cfg.train
        names = m.trainable_params_name if stage == 0 else (
            m.trainable_params_name_update or m.trainable_params_name
        )
        lr = t.lr if stage == 0 else (t.lr_update or t.lr)
        tx, opt_state = build_stage_optimizer(
            self.variables["params"], lr, t.weight_decay, names
        )
        log.info("stage %d optimizer: lr=%g trainable=%s", stage, lr, list(names))
        return tx, opt_state

    # ---------------- train ----------------

    def train(self, start_epoch: int = 0, resume: Optional[str] = None):
        cfg = self.cfg
        # persistent scalar curves (ckpts/<id>/scalars.csv) — the durable
        # replacement for the reference's tensorboardX writer
        # (train_deeplab.py:175); process 0 only under multi-host
        writer = (ScalarWriter(cfg.model_dir)
                  if cfg.model_dir and jax.process_index() == 0 else None)
        train_ds, val_ds = self.build_datasets()
        # Each host loads only its contiguous slice of the globally-shuffled batch
        # (the local_batch_slice contract; host-major mesh keeps rows local).
        loader = Loader(
            train_ds, batch_size=self.local_batch, shuffle=True, drop_last=True,
            num_workers=cfg.data.num_workers, seed=cfg.train.seed,
            shard_index=jax.process_index(), shard_count=jax.process_count(),
        )

        raw = None
        if resume and self.ckpt.exists(resume):
            raw = self.ckpt.restore(resume)
            self.variables = {"params": raw["params"],
                              "batch_stats": raw.get("batch_stats")}
            start_epoch = int(raw["epoch"]) + 1
            # restore the historical best so a worse post-resume epoch cannot
            # overwrite the AUPRC_best checkpoint (absent in old checkpoints)
            if "best_auprc" in raw:
                self.best["AUPRC"] = float(raw["best_auprc"])
            log.warning("resumed %s at epoch %d (best AUPRC %.4f)", resume,
                        start_epoch, self.best["AUPRC"])

        # stage of the first epoch to run (see m2f_trainer: a full 'last'
        # checkpoint restores the matching stage's optimizer + PRNG)
        stage = int(cfg.train.warmup_epoch >= 0
                    and start_epoch >= cfg.train.warmup_epoch)
        tx, opt_state = self._stage_optimizer(stage)
        rng = jax.random.PRNGKey(cfg.train.seed)
        saved_stage = int(cfg.train.warmup_epoch >= 0 and raw is not None
                          and start_epoch - 1 >= cfg.train.warmup_epoch)
        if (raw is not None and "opt_state" in raw and "rng" in raw
                and saved_stage == stage):
            typed = self.ckpt.restore_typed(resume, {
                "params": self.variables["params"],
                "batch_stats": self.variables.get("batch_stats"),
                "opt_state": opt_state, "epoch": 0, "rng": rng,
                "best_auprc": 0.0,
            })
            opt_state = typed["opt_state"]
            rng = jnp.asarray(typed["rng"])
            log.warning("restored optimizer + PRNG state (full resume)")
        state = TrainState(
            params=self.variables["params"],
            batch_stats=self.variables.get("batch_stats"),
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            rng=rng,
        )
        # replicate the state over the (possibly global) mesh so every host's jit
        # sees identically-placed inputs
        state = place_train_state(state, self.mesh,
                                  cfg.train.model_parallel_min_size)
        paired = jax.process_count() > 1
        train_step = make_train_step(self.model, tx, self.rcl_params, paired=paired)

        for epoch in range(start_epoch, cfg.train.n_epochs):
            if stage == 0 and cfg.train.warmup_epoch >= 0 and epoch >= cfg.train.warmup_epoch:
                stage = 1
                self.variables = {"params": state.params,
                                  "batch_stats": state.batch_stats}
                tx, opt_state = self._stage_optimizer(1)
                state = state.replace(
                    opt_state=place_train_state(
                        opt_state, self.mesh,
                        cfg.train.model_parallel_min_size)
                )
                train_step = make_train_step(self.model, tx, self.rcl_params,
                                             paired=paired)

            t0 = time.time()
            n_img = 0
            train_ds.set_epoch(epoch)
            for img, target, gen_img, gen_target in loader:
                if paired:
                    # multi-host: each half is assembled into a GLOBAL batch-
                    # sharded array from this host's slice; the paired step
                    # concats [clean ‖ aug] inside jit
                    b = shard_global_batch(
                        (img, gen_img, target, gen_target), self.mesh
                    )
                else:
                    # single-process: concat on host so the data axis spans the
                    # full 2B paired rows (no idle devices when devices > B)
                    b = shard_batch(
                        (np.concatenate([img, gen_img]),
                         np.concatenate([target, gen_target])), self.mesh
                    )
                state, loss, aux = train_step(state, *b)
                n_img += img.shape[0] * 2
            if n_img == 0:
                raise RuntimeError(
                    f"loader produced no batches (dataset size {len(train_ds)} "
                    f"< global batch with drop_last)")
            dt = time.time() - t0
            log.warning(
                "epoch %d loss %.4f (%.1f img/s)", epoch, float(loss),
                n_img / max(dt, 1e-9),
            )

            metrics = self.valid(state, val_ds)
            log.warning("epoch %d %s", epoch, metrics)
            if writer is not None:
                writer.add_scalars({"train/loss": float(loss),
                                    "train/img_per_s": n_img / max(dt, 1e-9)},
                                   epoch)
                if metrics:
                    writer.add_scalars(
                        {f"val/{k}": float(v) for k, v in metrics.items()}, epoch)
            if metrics and metrics["AUPRC"] > self.best["AUPRC"]:
                self.best["AUPRC"] = metrics["AUPRC"]
                # orbax save is a COLLECTIVE under multi-host (sync barrier in
                # Checkpointer.save): every process must call it — a process-0
                # gate deadlocks the pod. Metrics are identical across hosts
                # (same val set, deterministic meter), so all hosts agree.
                self.ckpt.save(
                    "AUPRC_best",
                    params=state.params, batch_stats=state.batch_stats,
                    opt_state=state.opt_state, epoch=epoch,
                    best_auprc=self.best["AUPRC"],
                )
                log.warning("saved best model for AUPRC (%.4f)", metrics["AUPRC"])
            # fault-tolerance checkpoint: full state incl. optimizer + PRNG,
            # overwritten per epoch; resume with --resume last
            self.ckpt.save("last", params=state.params,
                           batch_stats=state.batch_stats,
                           opt_state=state.opt_state, epoch=epoch,
                           rng=state.rng, best_auprc=self.best["AUPRC"])

        self.variables = {"params": state.params, "batch_stats": state.batch_stats}
        return self.best

    # ---------------- eval ----------------

    def valid(self, state: TrainState, val_ds) -> Optional[Dict[str, float]]:
        """Per-epoch validation: on-device binned metrics (the reference's sklearn
        hot spot never leaves the device) over shape-bucketed batches — the same
        batch-4 bucket logic as ``OODEvaluator.test`` (``batched_valid``)."""
        from .validation import batched_valid

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return batched_valid(
            val_ds, lambda imgs: self.eval_step(variables, imgs)[0]
        )
