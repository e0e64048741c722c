"""Vanilla Mask2Former semantic / instance / panoptic segmentation trainer.

The reference ships the full vanilla detectron2 config family
(``configs/mask2former-cityscapes/{semantic,instance,panoptic}-segmentation/``)
but no entry point ever exercises it (SURVEY §2.2 — the OOD trainers hardcode
``anomaly_ft.yaml``). This framework closes the loop: the
``exps/m2f_{semantic,instance,panoptic}*.yaml`` configs select this trainer (via
``train.cli`` on the ``instance_on`` / ``panoptic_on`` / ``not ood_finetune``
switches), which feeds
:mod:`multishiftseg_tpu.data.mappers` per-segment targets — duplicate classes
allowed, exactly the reference ``prepare_targets`` semantics
(``maskformer_model.py:316-339``) — into
:func:`multishiftseg_tpu.losses.criterion.set_criterion_instance` through the
vanilla (non-anomaly) decoder, with the official AdamW groups + global clip.

TPU-first shape discipline: targets are a static ``[H, W]`` segment id map plus
a padded ``[T]`` class vector (``T = cfg.model.m2f.max_instances``); images with
more segments keep the T largest (logged). One jitted step, batch-sharded over
the train mesh.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..core.config import Config
from ..core.logging import ScalarWriter
from ..core.mesh import (DATA_AXIS, fit_mesh_to_batch, make_global_mesh,
                         place_train_state, shard_batch,
                         shard_global_batch)
from ..data.loader import Loader
from ..data.mappers import (SegmentTargets, instance_to_targets,
                            panoptic_to_targets, remap_classes, rgb2id,
                            semantic_to_targets)
from ..data.registry import DatasetCatalog, MetadataCatalog
from ..data.transforms import (Compose, Normalize, RandCrop, RandHorizontalFlip,
                               Sample, ToTensor)
from ..losses.criterion import CriterionConfig, set_criterion_instance
from ..models.maskformer import MaskFormer
from .checkpoint import CheckpointManager
from .state import TrainState, build_m2f_official_optimizer

log = logging.getLogger(__name__)


def _take_segments(tgt: SegmentTargets, keep: np.ndarray) -> SegmentTargets:
    """Keep the given (sorted) segment indices, renumbering the id map."""
    k = len(tgt.classes)
    remap = -np.ones(k + 1, np.int32)
    remap[keep] = np.arange(len(keep), dtype=np.int32)
    id_map = np.where(tgt.id_map >= 0, remap[tgt.id_map], -1).astype(np.int32)
    return SegmentTargets(id_map, tgt.classes[keep], tgt.is_thing[keep])


def _areas(tgt: SegmentTargets) -> np.ndarray:
    return np.bincount(tgt.id_map[tgt.id_map >= 0].ravel(),
                       minlength=len(tgt.classes))


def clip_targets(tgt: SegmentTargets, k_max: int) -> SegmentTargets:
    """Keep the ``k_max`` largest segments (by pixel count) and renumber the id
    map accordingly — the static-shape stand-in for the reference's unbounded
    per-image instance list."""
    if len(tgt.classes) <= k_max:
        return tgt
    keep = np.sort(np.argsort(_areas(tgt))[::-1][:k_max])
    return _take_segments(tgt, keep)


def drop_empty_segments(tgt: SegmentTargets) -> SegmentTargets:
    """Drop segments with no pixels (cropped away): the panoptic path builds
    targets from per-record ``segments_info``, which lists segments the
    geometric augmentation may have removed entirely (the reference mapper
    filters these post-crop too)."""
    if not len(tgt.classes):
        return tgt
    keep = np.where(_areas(tgt) > 0)[0]
    return tgt if len(keep) == len(tgt.classes) else _take_segments(tgt, keep)


class InstanceDataset:
    """Catalog records -> ``(image [H,W,3] f32, id_map [H,W] i32, classes [T] i32)``.

    ``task`` follows the registry metadata: 'instance' reads Cityscapes-style
    ``instanceIds`` pngs (``class_id * divisor + instance``); 'panoptic' reads
    COCO-panoptic RGB id pngs + per-record ``segments_info``; 'sem_seg' reads
    plain label maps and emits one segment per present class (the reference
    ``MaskFormerSemanticDatasetMapper`` target build). Geometry transforms run
    on the raw encoded id map (nearest-neighbour, id-preserving); targets are
    built AFTER augmentation, like the reference mappers.
    """

    def __init__(self, name: str, transform: Compose, max_instances: int,
                 seed: int = 0):
        self.records = DatasetCatalog.get(name)
        self.meta = MetadataCatalog.get(name)
        self.task = self.meta.get("task", "instance")
        assert self.task in ("instance", "panoptic", "sem_seg"), self.task
        self.transform = transform
        self.max_instances = max_instances
        self.seed = seed
        self._epoch = 0

    def __len__(self):
        return len(self.records)

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __getitem__(self, i: int):
        rec = self.records[i]
        rng = np.random.default_rng(
            (self.seed * 100003 + self._epoch) * 1000003 + i)
        img = np.asarray(Image.open(rec["file_name"]).convert("RGB"),
                         np.float32) / 255.0
        if self.task == "instance":
            enc = np.asarray(Image.open(rec["instance_file_name"]), np.int32)
        elif self.task == "sem_seg":
            enc = np.asarray(Image.open(rec["sem_seg_file_name"]), np.int32)
        else:
            enc = rgb2id(np.asarray(
                Image.open(rec["pan_seg_file_name"]).convert("RGB"))).astype(np.int32)
        s = self.transform(rng, Sample(img, enc))
        if self.task == "instance":
            tgt = instance_to_targets(
                s.mask, divisor=self.meta.get("id_divisor", 1000))
        elif self.task == "sem_seg":
            tgt = semantic_to_targets(
                s.mask, ignore_label=self.meta.get("ignore_label", 255))
        else:
            tgt = drop_empty_segments(panoptic_to_targets(
                s.mask, rec["segments_info"],
                thing_ids=self.meta.get("thing_ids")))
        class_map = self.meta.get("class_map")
        if class_map:  # raw dataset ids -> contiguous training ids
            tgt = remap_classes(tgt, class_map)
        k = len(tgt.classes)
        if k > self.max_instances:
            log.warning("record %s: %d segments clipped to %d",
                        rec["file_name"], k, self.max_instances)
            tgt = clip_targets(tgt, self.max_instances)
        tgt = tgt.padded(self.max_instances)
        return (s.image.astype(np.float32), tgt.id_map.astype(np.int32),
                tgt.classes.astype(np.int32))


class TrainM2FInstance:
    """Instance/panoptic training loop (non-paired batches, no OOD machinery)."""

    def __init__(self, cfg: Config, weight_path: Optional[str] = None,
                 model: Optional[MaskFormer] = None,
                 dataset_name: Optional[str] = None):
        self.cfg = cfg
        m = cfg.model.m2f
        self.task = ("panoptic" if m.panoptic_on
                     else "instance" if m.instance_on else "semantic")
        # batches are NOT paired here — the data axis fits train_batch rows.
        # Multi-host: host-major global mesh, each host feeds its contiguous
        # batch slice (same contract as the OOD trainers, minus the halves).
        if jax.process_count() > 1:
            self.mesh = make_global_mesh(
                model_parallel=cfg.train.model_parallel)
            n = self.mesh.shape[DATA_AXIS]
            if cfg.train.train_batch % n != 0:
                raise ValueError(
                    f"train_batch {cfg.train.train_batch} not divisible by the "
                    f"global data axis ({n} devices over "
                    f"{jax.process_count()} hosts)")
        else:
            self.mesh = fit_mesh_to_batch(cfg.train.train_batch,
                                          cfg.train.num_devices,
                                          cfg.train.model_parallel)
        self.local_batch = cfg.train.train_batch // jax.process_count()
        self.model = model or MaskFormer(
            num_classes=m.num_classes, backbone=m.backbone,
            hidden_dim=m.hidden_dim, num_queries=m.num_queries, nheads=m.nheads,
            dim_feedforward=m.dim_feedforward, dec_layers=m.dec_layers - 1,
            mask_dim=m.mask_dim, transformer_enc_layers=m.transformer_enc_layers,
            pixel_decoder=m.pixel_decoder, predictor=m.transformer_decoder,
            dtype=jnp.bfloat16 if cfg.train.bf16 else None,
        )
        self.crit_cfg = CriterionConfig(
            num_classes=m.num_classes, eos_coef=m.no_object_weight,
            num_points=m.train_num_points, oversample_ratio=m.oversample_ratio,
            importance_sample_ratio=m.importance_sample_ratio,
            class_weight=m.class_weight, mask_weight=m.mask_weight,
            dice_weight=m.dice_weight, ood_weight=0.0, ood_loss="none",
            deep_supervision=m.deep_supervision,
            mask_loss_with_pixel_selection=False,
        )
        self.dataset_name = dataset_name or self._register_default()
        self.ckpt = CheckpointManager(cfg.model_dir)
        self.variables = self._build_variables(weight_path)

    def _register_default(self, split: str = "train") -> str:
        """Register the Cityscapes-layout dataset under ``cfg.data.cityscapes_root``
        (the path the reference's Base-Cityscapes yamls assume)."""
        import os

        from ..data.registry import (register_instance_folder,
                                     register_panoptic_folder,
                                     register_semantic_folder)

        from ..data.cityscapes import LABELS

        root = self.cfg.data.cityscapes_root
        name = f"cityscapes_{self.task}_{split}"
        if name in DatasetCatalog.list():
            return name
        # the raw-id -> contiguous maps detectron2 keeps in dataset metadata:
        # things (hasInstances & !ignoreInEval) -> 0..7; panoptic raw id -> trainId
        thing_raw = [l.id for l in LABELS if l.has_instances and not l.ignore_in_eval]
        if self.task == "semantic":
            # labelTrainIds pngs are already contiguous train ids — no class_map
            # (the reference's cityscapes_fine_sem_seg_{train,val} registration)
            register_semantic_folder(
                name,
                image_dir=os.path.join(root, "leftImg8bit", split),
                label_dir=os.path.join(root, "gtFine", split),
                image_suffix="_leftImg8bit.png",
                label_suffix="_gtFine_labelTrainIds.png",
            )
        elif self.task == "instance":
            register_instance_folder(
                name,
                image_dir=os.path.join(root, "leftImg8bit", split),
                instance_dir=os.path.join(root, "gtFine", split),
            )
            MetadataCatalog.set(
                name, class_map={c: i for i, c in enumerate(thing_raw)})
        else:
            register_panoptic_folder(
                name,
                image_dir=os.path.join(root, "leftImg8bit", split),
                panoptic_dir=os.path.join(root, "gtFine",
                                          f"cityscapes_panoptic_{split}"),
                panoptic_json=os.path.join(
                    root, "gtFine", f"cityscapes_panoptic_{split}.json"),
                thing_ids=thing_raw,
            )
            MetadataCatalog.set(
                name, class_map={l.id: l.train_id for l in LABELS
                                 if 0 <= l.train_id < 255})
        return name

    def _build_variables(self, weight_path: Optional[str]):
        if weight_path:
            from ..convert.torch2jax import (convert_maskformer,
                                             load_torch_checkpoint)

            log.info("loading torch checkpoint %s", weight_path)
            return jax.tree_util.tree_map(jnp.asarray, convert_maskformer(
                load_torch_checkpoint(weight_path),
                dec_layers=self.cfg.model.m2f.dec_layers - 1,
            ))
        log.warning("no weight_path; training from random init")
        h, w = self.cfg.data.crop_size
        hp, wp = -(-h // 32) * 32, -(-w // 32) * 32
        return jax.jit(self.model.init, static_argnames=("train",))(
            {"params": jax.random.PRNGKey(self.cfg.train.seed)},
            jnp.zeros((1, hp, wp, 3), jnp.float32), train=False,
        )

    def build_dataset(self) -> InstanceDataset:
        d = self.cfg.data
        transform = Compose([
            [ToTensor(), 1.0],
            [RandHorizontalFlip(), 0.5],
            [RandCrop(size=tuple(d.crop_size)), 1.0],
            [Normalize(mean=d.mean, std=d.std), 1.0],
        ])
        return InstanceDataset(self.dataset_name, transform,
                               self.cfg.model.m2f.max_instances,
                               seed=self.cfg.train.seed)

    def make_train_step(self, tx):
        model, crit_cfg = self.model, self.crit_cfg

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state: TrainState, img, id_map, classes):
            rng, step_rng, drop_rng = jax.random.split(state.rng, 3)

            def loss_fn(params):
                from .m2f_trainer import _vars

                outputs = model.apply(
                    _vars(params, state.batch_stats), img,
                    train=True, rngs={"dropout": drop_rng},
                )
                return set_criterion_instance(
                    outputs, id_map, classes, step_rng, crit_cfg)

            (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.params, updates)
            return (
                TrainState(params=new_params, batch_stats=state.batch_stats,
                           opt_state=new_opt, step=state.step + 1, rng=rng),
                loss, losses,
            )

        return step

    def train(self, start_epoch: int = 0, resume: Optional[str] = None):
        cfg = self.cfg
        m = cfg.model.m2f
        ds = self.build_dataset()
        loader = Loader(ds, batch_size=self.local_batch, shuffle=True,
                        drop_last=True, num_workers=cfg.data.num_workers,
                        seed=cfg.train.seed,
                        shard_index=jax.process_index(),
                        shard_count=jax.process_count())

        tx, opt_state = build_m2f_official_optimizer(
            self.variables["params"], base_lr=m.base_lr,
            weight_decay=m.weight_decay, clip_value=m.clip_gradients_value,
            trainable_names=cfg.model.trainable_params_name or (".",),
        )
        if resume and self.ckpt.exists(resume):
            # typed restore: the 'last' checkpoint carries the Adam moments —
            # resuming with a fresh optimizer would silently change dynamics
            restored = self.ckpt.restore_typed(resume, {
                "params": self.variables["params"],
                "batch_stats": self.variables.get("batch_stats"),
                "opt_state": opt_state,
                "epoch": 0,
            })
            self.variables = {"params": restored["params"],
                              "batch_stats": restored["batch_stats"]}
            opt_state = restored["opt_state"]
            start_epoch = int(restored["epoch"]) + 1
            log.warning("resumed %s at epoch %d", resume, start_epoch)
        step_fn = self.make_train_step(tx)
        state = TrainState(
            params=self.variables["params"],
            batch_stats=self.variables.get("batch_stats"),
            opt_state=opt_state, step=jnp.zeros((), jnp.int32),
            rng=jax.random.PRNGKey(cfg.train.seed),
        )
        state = place_train_state(state, self.mesh,
                                  cfg.train.model_parallel_min_size)

        writer = (ScalarWriter(cfg.model_dir)  # scalars.csv; see deeplab_trainer
                  if cfg.model_dir and jax.process_index() == 0 else None)
        last_loss = float("nan")
        for epoch in range(start_epoch, cfg.train.n_epochs):
            ds.set_epoch(epoch)
            t0, n_img = time.time(), 0
            for img, id_map, classes in loader:
                if jax.process_count() > 1:
                    b = shard_global_batch((img, id_map, classes), self.mesh)
                else:
                    b = shard_batch((img, id_map, classes), self.mesh)
                state, loss, losses = step_fn(state, *b)
                n_img += img.shape[0]
            if n_img == 0:
                raise RuntimeError(
                    f"loader produced no batches (dataset size {len(ds)} < "
                    f"batch {cfg.train.train_batch} with drop_last)")
            last_loss = float(loss)
            log.warning("epoch %d loss %.4f (%.1f img/s)", epoch, last_loss,
                        n_img / max(time.time() - t0, 1e-9))
            if writer is not None:
                writer.add_scalar("train/loss", last_loss, epoch)
            self.ckpt.save("last", params=state.params,
                           batch_stats=state.batch_stats,
                           opt_state=state.opt_state, epoch=epoch)

        self.variables = {"params": state.params,
                          "batch_stats": state.batch_stats}
        return {"loss": last_loss}

    def evaluate(self, dataset_name: Optional[str] = None,
                 max_images: Optional[int] = None) -> Optional[Dict[str, float]]:
        """COCO-protocol instance AP over a registered val split: per-image
        model forward -> ``instance_inference`` top-k mask extraction ->
        :class:`InstanceSegEvaluator` (the evaluator the reference ships but
        never wires into an entry point, ``instance_evaluation.py:30``).
        The panoptic task additionally reports PQ/SQ/RQ (+ things/stuff
        splits) via ``panoptic_inference`` -> :class:`PanopticEvaluator`."""
        from ..data.cityscapes import LABELS
        from ..evals.instance_metrics import InstanceSegEvaluator
        from ..evals.panoptic_metrics import (PanopticEvaluator,
                                              targets_to_panoptic)
        from ..models.inference_extras import (instance_inference,
                                               panoptic_inference)
        from ..ops.resize import resize_bilinear_nchw

        d = self.cfg.data
        m = self.cfg.model.m2f
        name = dataset_name or self._register_default("val")
        transform = Compose([[ToTensor(), 1.0],
                             [Normalize(mean=d.mean, std=d.std), 1.0]])
        # generous padding: eval ground truth must not clip segments
        ds = InstanceDataset(name, transform, max_instances=256)
        if len(ds) == 0:
            return None
        model = self.model
        variables = {"params": self.variables["params"]}
        if self.variables.get("batch_stats") is not None:
            variables["batch_stats"] = self.variables["batch_stats"]

        @jax.jit
        def fwd(img):
            out = model.apply(variables, img, train=False)
            return out["pred_logits"], out["pred_masks"]

        n_eval = len(ds) if max_images is None else min(len(ds), max_images)
        if self.task == "semantic":
            return self._evaluate_semantic(ds, fwd, n_eval)

        # panoptic gt mixes stuff + things; instance AP scores things only
        thing_ids = ({l.train_id for l in LABELS
                      if l.has_instances and not l.ignore_in_eval}
                     if self.task == "panoptic" else None)
        ev = InstanceSegEvaluator(m.num_classes)
        pq_ev = (PanopticEvaluator(m.num_classes, thing_ids)
                 if self.task == "panoptic" else None)
        n = n_eval
        from ..data.loader import pad_to_multiple
        from ..data.mappers import segments_to_masks

        for i in range(n):
            img, id_map, classes = ds[i]
            imgp, (h, w) = pad_to_multiple(img, 32)
            logits, masks = fwd(jnp.asarray(imgp[None]))
            masks_up = resize_bilinear_nchw(masks, imgp.shape[:2],
                                            align_corners=False)
            cls_np = np.asarray(logits[0], np.float32)
            mask_np = np.asarray(masks_up[0], np.float32)[:, :h, :w]
            pred = instance_inference(cls_np, mask_np, thing_ids=thing_ids)
            if pq_ev is not None:
                pan_seg, seg_info = panoptic_inference(
                    cls_np, mask_np, thing_ids=thing_ids)
                pq_ev.process(pan_seg, seg_info,
                              *targets_to_panoptic(id_map, classes))
            k = int((classes >= 0).sum())  # padded() keeps valid slots first
            gt_masks = segments_to_masks(id_map, k)
            gt_classes = classes[:k].astype(np.int64)
            if thing_ids is not None and k:
                keep = np.isin(gt_classes, list(thing_ids))
                gt_masks, gt_classes = gt_masks[keep], gt_classes[keep]
            ev.process(
                {"masks": pred["pred_masks"].astype(bool),
                 "scores": pred["scores"], "classes": pred["pred_classes"]},
                {"masks": gt_masks, "classes": gt_classes},
            )
        out = ev.evaluate()
        if pq_ev is not None and out is not None:
            pq = pq_ev.evaluate()
            out.update({k: v for k, v in pq.items() if k != "PQ_per_class"})
        return out

    def _evaluate_semantic(self, ds, fwd, n: int) -> Optional[Dict[str, float]]:
        """Vanilla semantic task: mIoU / pixel accuracy over the val split.

        Per-image semantic map = argmax of the standard mask-classification
        inference einsum softmax(cls)[:, :K] x sigmoid(mask)
        (``maskformer_model.py:341-347`` without the Mask2Anomaly concat); gt
        reassembled from the segment targets (one segment per class)."""
        from ..data.loader import pad_to_multiple
        from ..data.mappers import SegmentTargets, targets_to_semantic
        from ..evals.seg_metrics import compute_metric, hist_info
        from ..ops.resize import resize_bilinear_nchw

        num_classes = self.cfg.model.m2f.num_classes
        results = []
        for i in range(n):
            img, id_map, classes = ds[i]
            imgp, (h, w) = pad_to_multiple(img, 32)
            logits, masks = fwd(jnp.asarray(imgp[None]))
            masks_up = resize_bilinear_nchw(masks, imgp.shape[:2],
                                            align_corners=False)
            probs = jax.nn.softmax(logits[0].astype(jnp.float32), -1)[:, :-1]
            sem = jnp.einsum("qc,qhw->chw", probs,
                             jax.nn.sigmoid(masks_up[0].astype(jnp.float32)))
            pred = np.asarray(jnp.argmax(sem, 0))[:h, :w]
            k = int((classes >= 0).sum())
            gt = targets_to_semantic(SegmentTargets(
                id_map, classes[:k].astype(np.int64), np.zeros(k, bool)))
            hist, labeled, correct = hist_info(num_classes, pred, gt)
            results.append({"hist": hist, "labeled": labeled, "correct": correct})
        if not results:
            return None
        miou, pacc = compute_metric(results, num_classes)
        return {"mIoU": float(miou), "pixel_acc": float(pacc)}
