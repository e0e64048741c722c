"""Mask2Former OOD fine-tuning trainer — the TPU-native ``TrainM2FOOD``.

Re-implements the behaviour of ``train_m2f.py:35-526``: heavy probabilistic paired
augmentation pipeline, OOD head (``class_embed2``) initialized by weight copy from
``class_embed``, and the two-stage recipe —
  * stage 1 (epoch < warmup): eval-style forward -> semantic logits + Mask2Anomaly
    anomaly score -> RCL loss; Adam over ``class_embed2`` only; backbone always eval
    (``set_train_mode``, train_m2f.py:409-412);
  * stage 2: the official Hungarian-matched SetCriterion (with RCL plugged in as the
    OOD loss) over all parameters via the detectron2-style AdamW groups + full-model
    grad clipping.

Both stages are single jitted steps over the data mesh.
"""

from __future__ import annotations

import functools
import logging
import os
import time
from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..core.logging import ScalarWriter
from ..core.mesh import (make_train_mesh, place_train_state,
                         shard_batch,
                         shard_global_batch)
from ..data.anomaly import RoadAnomaly21
from ..data.cityscapes import DiverseCityscapes
from ..data.loader import Loader
from ..data.transforms import (
    AutoContrast, ColorJitter, Compose, Equalize, GaussianBlur, Normalize,
    RandCrop, RandHorizontalFlip, RandResize, RandRotate, RandSharpness,
    RandVerticalFlip, ToTensor,
)
from ..losses.criterion import CriterionConfig, set_criterion
from ..losses.rcl import make_rcl_params, rel_contrastive_loss
from ..models.maskformer import MaskFormer, inference
from .checkpoint import CheckpointManager
from .state import TrainState, build_m2f_official_optimizer, build_stage_optimizer

log = logging.getLogger(__name__)


def _vars(params, batch_stats):
    """Apply-collections dict tolerating batch_stats=None (Swin backbones have
    no BatchNorm; flax rejects a None collection)."""
    v = {"params": params}
    if batch_stats is not None:
        v["batch_stats"] = batch_stats
    return v


def copy_class_embed_to_ood(params):
    """class_embed2 <- class_embed (reference ``train_m2f.py:125-132``).

    Materializes a COPY: aliasing the same buffer at two tree leaves breaks
    donated train steps ('attempt to donate the same buffer twice')."""
    flat = flax.traverse_util.flatten_dict(params)
    for leaf in ("kernel", "bias"):
        flat[("predictor", "class_embed2", leaf)] = jnp.array(
            flat[("predictor", "class_embed", leaf)], copy=True
        )
    return flax.traverse_util.unflatten_dict(flat)


class TrainM2FOOD:
    def __init__(self, cfg: Config, weight_path: Optional[str] = None,
                 model: Optional[MaskFormer] = None):
        self.cfg = cfg
        # single-process: halves concatenated on host, data axis fits 2B rows;
        # multi-process: host-major global mesh, halves fed as separate global
        # arrays (in-jit concat), data axis must divide ONE half (core.mesh)
        self.mesh = make_train_mesh(cfg.train.train_batch, cfg.train.num_devices,
                                    cfg.train.model_parallel,
                                    cfg.train.pipeline_parallel)
        self._paired = jax.process_count() > 1
        if cfg.train.train_batch % jax.process_count() != 0:
            raise ValueError(
                f"train_batch {cfg.train.train_batch} not divisible by "
                f"{jax.process_count()} hosts"
            )
        self.local_batch = cfg.train.train_batch // jax.process_count()
        m = cfg.model.m2f
        # loss.params.mask2anomaly_loss_weight overrides the model loss weights
        # (the reference's setup(), train_m2f.py:160-168).
        lw = (cfg.loss.params or {}).get("mask2anomaly_loss_weight") or {}
        m.class_weight = lw.get("class_weight", m.class_weight)
        m.mask_weight = lw.get("mask_weight", m.mask_weight)
        m.dice_weight = lw.get("dice_weight", m.dice_weight)
        m.ood_weight = lw.get("ood_weight", m.ood_weight)
        self.model = model or MaskFormer(
            num_classes=m.num_classes, backbone=m.backbone, hidden_dim=m.hidden_dim,
            num_queries=m.num_queries, nheads=m.nheads,
            dim_feedforward=m.dim_feedforward, dec_layers=m.dec_layers - 1,
            mask_dim=m.mask_dim, transformer_enc_layers=m.transformer_enc_layers,
            pixel_decoder=m.pixel_decoder,
            predictor=m.transformer_decoder,
            dtype=jnp.bfloat16 if cfg.train.bf16 else None,
        )
        self.rcl_params = make_rcl_params(cfg.loss.params)
        self.crit_cfg = CriterionConfig(
            num_classes=m.num_classes, eos_coef=m.no_object_weight,
            num_points=m.train_num_points,
            importance_sample_ratio=m.importance_sample_ratio,
            oversample_ratio=m.oversample_ratio, class_weight=m.class_weight,
            mask_weight=m.mask_weight, dice_weight=m.dice_weight,
            ood_weight=m.ood_weight,
            ood_loss="RCL" if cfg.model.mask2anomaly.replace_official_odd_loss_with_RCL
            else m.ood_loss,
            margin=m.margin, deep_supervision=cfg.model.mask2anomaly.deep_supervision,
            mask_loss_with_pixel_selection=(
                cfg.model.mask2anomaly.mask_loss_with_pixel_selection
            ),
            # accuracy-gated opt-in (like MSS_BF16_SCATTER): approximate
            # point-selection top-k via the TPU bucketed approx_min_k
            approx_point_topk=os.environ.get("MSS_APPROX_POINTS", "") == "1",
        )
        # pipeline parallelism (cfg.train.pipeline_parallel): the TRAIN steps
        # run a clone whose deformable encoder stack is GPipe-staged over the
        # mesh's pipe axis (stacked encoder_stack runtime param layout); eval
        # and every on-disk checkpoint stay in the sequential named layout —
        # _pack_tree/_unpack_tree convert at the train-state boundary.
        self._pp = cfg.train.pipeline_parallel
        self._n_enc = self.model.transformer_enc_layers
        if self._pp > 1:
            if self.model.pixel_decoder != "msdeformattn":
                raise ValueError(
                    "pipeline_parallel requires the msdeformattn pixel decoder "
                    f"(got {self.model.pixel_decoder!r})")
            from ..core.mesh import DATA_AXIS
            from ..core.pipeline import auto_microbatches

            per_shard = 2 * cfg.train.train_batch // self.mesh.shape[DATA_AXIS]
            n_micro = (cfg.train.pipeline_microbatches
                       or auto_microbatches(per_shard, self._pp))
            if per_shard % n_micro:
                raise ValueError(
                    f"per-data-shard batch {per_shard} not divisible by "
                    f"pipeline_microbatches={n_micro}")
            self.train_model = self.model.clone(
                pipe_mesh=self.mesh, pipe_n_micro=n_micro,
                pipe_x_spec=(DATA_AXIS,))
        else:
            self.train_model = self.model
        self.best: Dict[str, float] = {"AUPRC": -1.0}
        self.ckpt = CheckpointManager(cfg.model_dir)
        self.variables = self._build_variables(weight_path)

    def _build_variables(self, weight_path: Optional[str]):
        if weight_path:
            from ..convert.torch2jax import convert_maskformer, load_torch_checkpoint

            log.info("loading torch checkpoint %s", weight_path)
            variables = convert_maskformer(
                load_torch_checkpoint(weight_path),
                dec_layers=self.cfg.model.m2f.dec_layers - 1,
            )
            variables["params"] = copy_class_embed_to_ood(variables["params"])
            return jax.tree_util.tree_map(jnp.asarray, variables)
        log.warning("no weight_path; training from random init")
        h, w = self.cfg.data.crop_size
        hp, wp = -(-h // 32) * 32, -(-w // 32) * 32
        return jax.jit(self.model.init, static_argnames=("train",))(
            {"params": jax.random.PRNGKey(self.cfg.train.seed)},
            jnp.zeros((1, hp, wp, 3), jnp.float32), train=False,
        )

    # ---------------- pipeline layout conversion ----------------

    def _map_param_trees(self, tree, fn):
        """Apply ``fn`` to every params-shaped dict inside ``tree`` (the params
        themselves, or the Adam moment trees nested in an optax state)."""
        return jax.tree_util.tree_map(
            lambda x: fn(x) if isinstance(x, dict) and "pixel_decoder" in x else x,
            tree,
            is_leaf=lambda x: isinstance(x, dict) and "pixel_decoder" in x)

    def _pack_tree(self, tree):
        """Named (disk/eval) -> stacked (pipeline runtime) layout; identity
        when pipeline is off or the tree is already packed."""
        if self._pp <= 1:
            return tree
        from ..core.pipeline import is_packed, pack_encoder_stack

        return self._map_param_trees(
            tree, lambda d: d if is_packed(d)
            else pack_encoder_stack(d, self._n_enc))

    def _unpack_tree(self, tree):
        """Stacked (pipeline runtime) -> named (disk/eval) layout."""
        if self._pp <= 1:
            return tree
        from ..core.pipeline import is_packed, unpack_encoder_stack

        return self._map_param_trees(
            tree, lambda d: unpack_encoder_stack(d, self._n_enc)
            if is_packed(d) else d)

    # ---------------- data ----------------

    def build_datasets(self):
        d = self.cfg.data
        # 12-stage probabilistic pipeline (train_m2f.py:48-61)
        train_tf = Compose([
            [ToTensor(), 1.0],
            [ColorJitter(), 0.5],
            [GaussianBlur(), 0.5],
            [RandSharpness(), 0.5],
            [AutoContrast(), 0.5],
            [Equalize(), 0.5],
            [RandResize(scale=[0.7, 0.8, 0.9, 1.0]), 0.5],
            [RandRotate(), 0.5],
            [RandHorizontalFlip(), 0.5],
            [RandVerticalFlip(), 0.5],
            [RandCrop(size=tuple(d.crop_size)), 1.0],
            [Normalize(mean=d.mean, std=d.std), 1.0],
        ])
        test_tf = Compose([ToTensor(), Normalize(mean=d.mean, std=d.std)])
        train_ds = DiverseCityscapes(
            root=d.cityscapes_root, generation_root=d.generation_root,
            coco_root=d.coco_root, split="train", transform=train_tf,
            anomaly_mix=d.anomaly_mix, mixup=d.mixup, seed=self.cfg.train.seed,
        )
        val_ds = RoadAnomaly21(root=d.anomaly_track_root, transform=test_tf)
        return train_ds, val_ds

    # ---------------- steps ----------------

    def _pad_batch(self, img: np.ndarray, target: np.ndarray):
        """Pad [B, H, W, C] / [B, H, W] bottom-right to /32 (ImageList semantics:
        images zero-pad, labels 255-pad)."""
        h, w = img.shape[1:3]
        ph, pw = (-h) % 32, (-w) % 32
        if ph or pw:
            img = np.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)))
            target = np.pad(target, ((0, 0), (0, ph), (0, pw)), constant_values=255)
        return img, target, (h, w)

    def make_stage1_step(self, tx, paired: bool = True):
        model, rcl_params = self.train_model, self.rcl_params
        crop_hw = tuple(self.cfg.data.crop_size)
        num_classes = self.model.num_classes

        def step(state: TrainState, img, target):
            rng, step_rng, drop_rng = jax.random.split(state.rng, 3)

            def loss_fn(params):
                outputs = model.apply(
                    _vars(params, state.batch_stats), img,
                    train=True, rngs={"dropout": drop_rng},
                )
                sem, anomaly = inference(outputs, img.shape[1:3],
                                         num_classes=num_classes)
                logit = sem[:, :num_classes, : crop_hw[0], : crop_hw[1]]
                logit = logit.transpose(0, 2, 3, 1)
                anomaly = anomaly[:, : crop_hw[0], : crop_hw[1]]
                tgt = target[:, : crop_hw[0], : crop_hw[1]]
                loss, aux = rel_contrastive_loss(
                    logit, anomaly, tgt, step_rng, rcl_params
                )
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
            return (
                TrainState(params=new_params, batch_stats=state.batch_stats,
                           opt_state=new_opt, step=state.step + 1, rng=rng),
                loss, aux,
            )

        return self._pairify(step) if paired else jax.jit(step, donate_argnums=(0,))

    def make_stage2_step(self, tx, paired: bool = True):
        model = self.train_model
        crit_cfg, rcl_params = self.crit_cfg, self.rcl_params
        crop_hw = tuple(self.cfg.data.crop_size)

        def step(state: TrainState, img, target):
            rng, step_rng, drop_rng = jax.random.split(state.rng, 3)

            def loss_fn(params):
                outputs = model.apply(
                    _vars(params, state.batch_stats), img,
                    train=True, rngs={"dropout": drop_rng},
                )
                total, losses = set_criterion(
                    outputs, target, step_rng, crit_cfg, rcl_params, crop_hw=crop_hw
                )
                return total, losses

            (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
            return (
                TrainState(params=new_params, batch_stats=state.batch_stats,
                           opt_state=new_opt, step=state.step + 1, rng=rng),
                loss, losses,
            )

        return self._pairify(step) if paired else jax.jit(step, donate_argnums=(0,))

    def _pairify(self, step):
        """Wrap a (state, img, target) step to take the clean/generated halves as
        four arrays and concat inside jit (multi-host: each host feeds its local
        slice of each half; the in-jit concat restores the global [clean ‖ aug]
        order the losses split at)."""

        @functools.partial(jax.jit, donate_argnums=(0,))
        def paired(state, img_c, img_g, tgt_c, tgt_g):
            return step(
                state,
                jnp.concatenate([img_c, img_g], 0),
                jnp.concatenate([tgt_c, tgt_g], 0),
            )

        return paired

    def make_eval_step(self):
        model = self.model
        num_classes = self.model.num_classes

        @jax.jit
        def eval_step(variables, img):
            # lax.map over the batch: the gather-bound deformable program
            # loses its layout at native batch > 1 and collapses ~3x; the
            # mapped batch-1 body runs at per-image parity (PERF.md round 4)
            def one(im):
                outputs = model.apply(variables, im[None], train=False)
                sem, anomaly = inference(outputs, im.shape[0:2],
                                         num_classes=num_classes)
                return sem[0], anomaly[0]

            return jax.lax.map(one, img)

        return eval_step

    # ---------------- train loop ----------------

    def train(self, start_epoch: int = 0, resume: Optional[str] = None):
        cfg = self.cfg
        # persistent scalar curves (ckpts/<id>/scalars.csv; see deeplab_trainer)
        writer = (ScalarWriter(cfg.model_dir)
                  if cfg.model_dir and jax.process_index() == 0 else None)
        train_ds, val_ds = self.build_datasets()
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
            if "best_auprc" in raw:  # keep the historical best (see deeplab)
                self.best["AUPRC"] = float(raw["best_auprc"])
            log.warning("resumed %s at epoch %d (best AUPRC %.4f)", resume,
                        start_epoch, self.best["AUPRC"])

        # stage of the FIRST epoch to run: building the matching optimizer up
        # front lets a full 'last' checkpoint restore its Adam moments instead
        # of restarting them at the warmup boundary re-run
        stage = int(cfg.train.warmup_epoch >= 0
                    and start_epoch >= cfg.train.warmup_epoch)
        m = cfg.model.m2f
        # runtime param layout: stacked encoder_stack when pipelining (the
        # optimizer trees are built on it so moments stage-shard with it);
        # self.variables and every checkpoint stay in the named layout
        params_rt = self._pack_tree(self.variables["params"])
        if stage == 0:
            tx, opt_state = build_stage_optimizer(
                params_rt, cfg.train.lr, cfg.train.weight_decay,
                cfg.model.trainable_params_name,
            )
            step_fn = self.make_stage1_step(tx, paired=self._paired)
        else:
            tx, opt_state = build_m2f_official_optimizer(
                params_rt, base_lr=m.base_lr,
                weight_decay=m.weight_decay, clip_value=m.clip_gradients_value,
                trainable_names=cfg.model.trainable_params_name_update or (".",),
            )
            step_fn = self.make_stage2_step(tx, paired=self._paired)
        rng = jax.random.PRNGKey(cfg.train.seed)
        # the saved optimizer's stage must match the start stage (a 'last'
        # checkpoint from the final warmup epoch holds a stage-1 optimizer
        # while the resumed epoch begins stage 2 — there the recipe's own
        # boundary switch builds the stage-2 optimizer fresh)
        saved_stage = int(cfg.train.warmup_epoch >= 0 and raw is not None
                          and start_epoch - 1 >= cfg.train.warmup_epoch)
        if (raw is not None and "opt_state" in raw and "rng" in raw
                and saved_stage == stage):
            # full fault-tolerance resume (the per-epoch 'last' checkpoint):
            # typed restore rebuilds the optax NamedTuple structure
            typed = self.ckpt.restore_typed(resume, {
                "params": self.variables["params"],
                "batch_stats": self.variables.get("batch_stats"),
                # checkpoints hold the named (sequential) layout; unpacking the
                # runtime opt template yields that structure value-exactly
                "opt_state": self._unpack_tree(opt_state),
                "epoch": 0, "rng": rng,
                "best_auprc": 0.0,
            })
            opt_state = self._pack_tree(typed["opt_state"])
            rng = jnp.asarray(typed["rng"])
            log.warning("restored optimizer + PRNG state (full resume)")
        state = TrainState(
            params=params_rt,
            batch_stats=self.variables.get("batch_stats"),
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32), rng=rng,
        )
        state = place_train_state(state, self.mesh,
                                  cfg.train.model_parallel_min_size)
        eval_step = self.make_eval_step()

        for epoch in range(start_epoch, cfg.train.n_epochs):
            if stage == 0 and cfg.train.warmup_epoch >= 0 and epoch >= cfg.train.warmup_epoch:
                stage = 1
                m = cfg.model.m2f
                tx, opt_state = build_m2f_official_optimizer(
                    state.params, base_lr=m.base_lr, weight_decay=m.weight_decay,
                    clip_value=m.clip_gradients_value,
                    trainable_names=cfg.model.trainable_params_name_update or (".",),
                )
                state = state.replace(
                    opt_state=place_train_state(
                        opt_state, self.mesh,
                        cfg.train.model_parallel_min_size)
                )
                step_fn = self.make_stage2_step(tx, paired=self._paired)
                log.warning("switched to stage-2 official loss + AdamW groups")

            t0, n_img = time.time(), 0
            train_ds.set_epoch(epoch)
            for img, target, gen_img, gen_target in loader:
                ic, tc, _ = self._pad_batch(img, target.astype(np.int32))
                ig, tg, _ = self._pad_batch(gen_img, gen_target.astype(np.int32))
                if self._paired:  # multi-host: per-half global arrays
                    b = shard_global_batch((ic, ig, tc, tg), self.mesh)
                else:  # single-process: host concat, shard the full 2B rows
                    b = shard_batch((np.concatenate([ic, ig]),
                                     np.concatenate([tc, tg])), self.mesh)
                state, loss, aux = step_fn(state, *b)
                n_img += ic.shape[0] * 2
            if n_img == 0:
                raise RuntimeError(
                    f"loader produced no batches (dataset size {len(train_ds)} "
                    f"< global batch with drop_last)")
            log.warning(
                "epoch %d loss %.4f (%.1f img/s)", epoch, float(loss),
                n_img / max(time.time() - t0, 1e-9),
            )

            metrics = self.valid(state, val_ds, eval_step)
            log.warning("epoch %d %s", epoch, metrics)
            if writer is not None:
                writer.add_scalars({"train/loss": float(loss), "stage": stage},
                                   epoch)
                if metrics:
                    writer.add_scalars(
                        {f"val/{k}": float(v) for k, v in metrics.items()}, epoch)
            if metrics and metrics["AUPRC"] > self.best["AUPRC"]:
                self.best["AUPRC"] = metrics["AUPRC"]
                # collective save: every host must call it (see deeplab_trainer)
                # (named on-disk layout: _unpack_tree is identity at pp=1)
                self.ckpt.save("AUPRC_best",
                               params=self._unpack_tree(state.params),
                               batch_stats=state.batch_stats,
                               opt_state=self._unpack_tree(state.opt_state),
                               epoch=epoch, best_auprc=self.best["AUPRC"])
                log.warning("saved best model for AUPRC (%.4f)", metrics["AUPRC"])
            # fault-tolerance checkpoint: full state incl. optimizer + PRNG,
            # overwritten per epoch; resume with --resume last
            self.ckpt.save("last", params=self._unpack_tree(state.params),
                           batch_stats=state.batch_stats,
                           opt_state=self._unpack_tree(state.opt_state),
                           epoch=epoch,
                           rng=state.rng, best_auprc=self.best["AUPRC"])

        self.variables = {"params": self._unpack_tree(state.params),
                          "batch_stats": state.batch_stats}
        return self.best

    def valid(self, state: TrainState, val_ds, eval_step) -> Optional[Dict[str, float]]:
        """Per-epoch validation: on-device binned metrics over shape-bucketed
        batches (``batched_valid``, shared with the DeepLab trainer)."""
        from .validation import batched_valid

        # eval runs the sequential model — convert back to the named layout
        # when training pipelined (identity at pp=1)
        variables = {"params": self._unpack_tree(state.params)}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        return batched_valid(
            val_ds, lambda imgs: eval_step(variables, imgs)[1]
        )
