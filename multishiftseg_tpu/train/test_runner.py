"""Evaluation runners — the TPU-native ``test_deeplab.py`` / ``test_m2f.py``.

Iterates the anomaly benchmarks (RoadAnomaly, SMIYC RA21/RO21, MUAD, ACDC-POC) with
whole-image forwards and reports AUROC/AUPRC/FPR@95 per dataset, like
``TestDeepLabOOD.test_all`` (``test_deeplab.py:74-140``).

TPU design: variable eval resolutions are padded to /32 *buckets* so the jitted
forward compiles once per bucket instead of once per unique shape; scores are cropped
back before metric computation.

CLI:
  python -m multishiftseg_tpu.train.test_runner --model deeplab \
      --cfg exps/deeplab.yaml --weight_path ckpt.pth [--test_dataset RoadAnomaly]
"""

from __future__ import annotations

import argparse
import logging
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config, load_config
from ..data.anomaly import EVAL_DATASETS
from ..data.transforms import Compose, Normalize, ToTensor
from ..evals.ood_metrics import eval_ood_measure
from ..evals.seg_metrics import compute_metric, hist_info

log = logging.getLogger(__name__)

# reference defaults: test_deeplab iterates {RoadAnomaly, RA21, RO21}; test_m2f adds MUAD
DEFAULT_DATASETS = ("RoadAnomaly", "RoadAnomaly21", "RoadObstacle21")
DEFAULT_DATASETS_M2F = DEFAULT_DATASETS + ("MUAD",)


def bucket_shape(h: int, w: int, multiple: int = 128) -> Tuple[int, int]:
    """Round (h, w) up to a coarse bucket to bound the number of compiled programs."""
    return (-(-h // multiple) * multiple, -(-w // multiple) * multiple)


def tta_wrap(forward_fn):
    """Horizontal-flip TTA over an (anomaly, sem) forward
    (``SemanticSegmentorWithTTA``, ``test_time_augmentation.py:21-103``)."""

    def wrapped(img):
        a, s = forward_fn(img)
        a2, s2 = forward_fn(img[:, :, ::-1])
        a = 0.5 * (a + a2[:, :, ::-1])
        if s is not None and s2 is not None:
            s = 0.5 * (s + s2[..., ::-1])
        return a, s

    return wrapped


class OODEvaluator:
    """Shared whole-image eval loop over the anomaly benchmarks."""

    def __init__(self, cfg: Config, forward_fn, dataset_roots: Dict[str, str],
                 tta: bool = False, save_dir: Optional[str] = None,
                 batch_size: int = 4, bucket_multiple: int = 128):
        """forward_fn(img [1,H,W,3] float) -> (anomaly [1,H,W], sem_logits or None).

        ``batch_size``: images per forward within a shape bucket. Batch 4 is
        safe for both models: DeepLab gains ~1.6x from native batching
        (conv-tail amortization) and the m2f forward maps over the batch
        inside its jit (``build_m2f_forward``) because the gather-bound
        deformable program loses its layout at native batch > 1 (PERF.md
        round 4: 2.94 img/s native batch 2 vs 8.44 via lax.map batch 4).

        ``bucket_multiple``: eval padding granularity (default /128). Spatial
        sharding raises it via :func:`spatial_bucket_multiple` so every
        feature level's height splits evenly over the mesh.

        ``save_dir``: if set, write per-image eval artifacts under
        ``<save_dir>/<dataset>/`` — ``<stem>_anomaly.npy`` (float32 score map)
        and ``<stem>_pred_color.png`` (train-id argmax colorized with the
        Cityscapes palette, ``utils.map2citycolor``) — the visualization the
        reference's ``map2citycolor``/``save_as_hdf5`` utils exist for
        (``lib/utils/utils.py:70-87``) but never wire into its test scripts."""
        self.cfg = cfg
        self.forward_fn = tta_wrap(forward_fn) if tta else forward_fn
        self.roots = dataset_roots
        self.save_dir = save_dir
        self.batch_size = batch_size
        self.bucket_multiple = bucket_multiple

    def _save_outputs(self, name: str, image_path: str,
                      anomaly: np.ndarray, sem: Optional[np.ndarray],
                      root: Optional[str] = None) -> None:
        import os

        from PIL import Image

        from ..utils import map2citycolor

        out = os.path.join(self.save_dir, name)
        os.makedirs(out, exist_ok=True)
        # key artifacts by the dataset-relative path (os.sep -> '_'), not the
        # basename: per-city/per-sequence layouts repeat basenames across
        # subdirectories and would silently overwrite each other's outputs
        rel = image_path
        if root:
            try:
                r = os.path.relpath(image_path, root)
                if not r.startswith(".."):
                    rel = r
            except ValueError:
                pass
        stem = os.path.splitext(rel)[0].replace(os.sep, "_").lstrip("_")
        np.save(os.path.join(out, f"{stem}_anomaly.npy"), anomaly)
        if sem is not None:
            pred = np.argmax(sem[:19], axis=0).astype(np.uint8)
            Image.fromarray(map2citycolor(pred)).save(
                os.path.join(out, f"{stem}_pred_color.png"))

    def _transform(self):
        d = self.cfg.data
        return Compose([ToTensor(), Normalize(mean=d.mean, std=d.std)])

    def test(self, name: str, batch_size: Optional[int] = None) -> Optional[Dict[str, float]]:
        """Evaluate one benchmark, batching images that share a padded bucket
        (per-model optimum set at construction; see ``__init__``)."""
        if batch_size is None:
            batch_size = self.batch_size
        ds_cls = EVAL_DATASETS[name]
        kwargs = {}
        if name in self.roots:
            kwargs["root"] = self.roots[name]
        ds = ds_cls(transform=self._transform(), **kwargs)
        if len(ds) == 0:
            log.warning("%s: no images found", name)
            return None
        scores: List[np.ndarray] = []
        gts: List[np.ndarray] = []
        hists = []

        # Group indices by padded bucket via a cheap header-only size probe, so
        # batches share one compiled program without decoding everything up front.
        from PIL import Image

        buckets: Dict[Tuple[int, int], List[int]] = {}
        for i in range(len(ds)):
            with Image.open(ds.images[i]) as im:
                w, h = im.size
            buckets.setdefault(bucket_shape(h, w, self.bucket_multiple),
                               []).append(i)

        for (bh, bw), idxs in buckets.items():
            for s in range(0, len(idxs), batch_size):
                chunk = [ds[i] for i in idxs[s : s + batch_size]]
                imgs = np.zeros((len(chunk), bh, bw, 3), np.float32)
                for j, item in enumerate(chunk):
                    img = item[0]
                    imgs[j, : img.shape[0], : img.shape[1]] = img
                anomaly, sem = self.forward_fn(jnp.asarray(imgs))
                anomaly = np.asarray(anomaly, np.float32)
                sem_np = (np.asarray(sem, np.float32)
                          if self.save_dir is not None and sem is not None else None)
                for j, item in enumerate(chunk):
                    h, w = item[0].shape[:2]
                    target = item[1]
                    eval_gt = item[3] if len(item) > 3 else None
                    scores.append(anomaly[j, :h, :w].reshape(-1))
                    gts.append(np.asarray(target).reshape(-1))
                    if self.save_dir is not None:
                        self._save_outputs(
                            name, ds.images[idxs[s + j]], anomaly[j, :h, :w],
                            None if sem_np is None else sem_np[j, :, :h, :w],
                            root=getattr(ds, "root", None))
                    if eval_gt is not None and sem is not None:
                        pred = np.asarray(jnp.argmax(sem[j, :19, :h, :w], axis=0))
                        hists.append(dict(zip(("hist", "labeled", "correct"),
                                              hist_info(19, pred, np.asarray(eval_gt)))))
        res = eval_ood_measure(np.concatenate(scores), np.concatenate(gts))
        out = {} if res is None else {
            "AUROC": res[0], "AUPRC": res[1], "FPR_TPR95": res[2]
        }
        if hists:
            miou, pacc = compute_metric(hists)
            out.update({"mIoU": miou, "pixel_acc": pacc})
        return out or None

    def test_all(self, names=DEFAULT_DATASETS) -> Dict[str, Dict[str, float]]:
        results = {}
        for name in names:
            try:
                r = self.test(name)
            except Exception as e:  # per-dataset resilience (test_deeplab.py:122-128)
                log.warning("%s failed: %s", name, e)
                r = None
            if r is not None:
                results[name] = r
                if "AUROC" in r:
                    log.warning(
                        "%s: AUROC %.2f AUPRC %.2f FPR95 %.2f", name,
                        100 * r["AUROC"], 100 * r["AUPRC"], 100 * r["FPR_TPR95"],
                    )
                if "mIoU" in r:
                    log.warning("%s: mIoU %.2f pixel_acc %.2f", name,
                                100 * r["mIoU"], 100 * r["pixel_acc"])
        return results


def spatial_jit(fn, variables, n_devices: int, min_stride: int = 1):
    """Jit an eval forward with the input image sharded SPATIALLY (height axis)
    over an ``n_devices`` data mesh — single-image latency scaling
    (``core/mesh.py::spatial_sharding``). Parameters are replicated; outputs
    are fetched to host by the caller as usual.

    ``min_stride``: the model's deepest feature stride (32 for the M2F
    backbones, 8 for the OS8 DeepLab trunk). The image height must divide
    ``rows * min_stride`` so EVERY feature level's height splits evenly over
    the mesh: a level with H < rows forces the partitioner into degenerate
    padded shards and involuntary replicate-then-repartition resharding
    (measured: the MULTICHIP_r04 ``input_proj_1_gn`` SPMD warning came from a
    stride-16 level with 4 rows on an 8-device mesh; at divisible shapes the
    program partitions cleanly with zero warnings — PERF.md round 5)."""
    from ..core.mesh import DATA_AXIS, make_mesh, replicated, spatial_sharding

    mesh = make_mesh(num_devices=n_devices)
    variables = jax.device_put(variables, replicated(mesh))
    rows = mesh.shape[DATA_AXIS]
    jf = jax.jit(fn, in_shardings=(replicated(mesh), spatial_sharding(mesh)))

    def wrapped(img):
        need = rows * min_stride
        if img.shape[1] % need:
            raise ValueError(
                f"image height {img.shape[1]} not divisible by "
                f"{need} (= {rows} spatial devices x deepest stride "
                f"{min_stride}); pad the eval bucket (OODEvaluator "
                f"bucket_multiple) so every feature level shards evenly")
        return jf(variables, img)

    return wrapped


def spatial_bucket_multiple(spatial_devices: int, min_stride: int = 32,
                            base: int = 128) -> int:
    """Eval bucket granularity that satisfies :func:`spatial_jit`'s
    divisibility contract (every feature level splits evenly over the mesh)."""
    if spatial_devices <= 0:
        return base
    need = spatial_devices * min_stride
    # lcm(base, need): both are powers-of-two multiples in practice
    import math

    return base * need // math.gcd(base, need)


def build_deeplab_forward(cfg: Config, weight_path: Optional[str],
                          spatial_devices: int = 0):
    from ..models.deeplab import DeepWV3Plus
    from ..train.deeplab_trainer import TrainDeepLabOOD

    trainer = TrainDeepLabOOD(cfg, weight_path)
    model, variables = trainer.model, trainer.variables

    def fwd(variables, img):
        score, logit = model.apply(variables, img, train=False)
        return score, logit.transpose(0, 3, 1, 2)

    if spatial_devices:
        # OS8 trunk: deepest feature stride 8
        return spatial_jit(fwd, variables, spatial_devices, min_stride=8)
    jf = jax.jit(fwd)
    return lambda img: jf(variables, img)


def sampling_qualification_path(weight_path: str):
    """Where ``tools/validate_release.py`` records the per-checkpoint
    approximate-sampling qualification (measured metric deltas vs exact
    bilinear on RoadAnomaly, gated at the BASELINE.md ±0.5-pt budget)."""
    from pathlib import Path

    p = Path(weight_path)
    return p.parent / (p.stem + ".sampling_qualification.json")


def check_sampling_qualification(weight_path: Optional[str],
                                 sample_mode: str) -> None:
    """Refuse an approximate sampling fast path whose measured-on-THESE-weights
    qualification failed the ±0.5-pt gate.

    ``tools/validate_release.py`` writes the artifact next to the checkpoint
    when real weights + RoadAnomaly are available; a failed mode is recorded
    ``qualified: false`` and this gate makes the refusal stick in every
    production eval entry point. Absent artifact = not yet measured on these
    weights: allowed with a warning (the compact-checkpoint qualification in
    outputs/r{4,5}/m2f_evidence.json is the standing evidence)."""
    if sample_mode == "bilinear" or not weight_path:
        return
    import json

    qp = sampling_qualification_path(weight_path)
    if not qp.exists():
        log.warning(
            "sample_mode=%s: no per-checkpoint qualification artifact (%s); "
            "standing evidence is the compact-checkpoint gate "
            "(outputs/r5/m2f_evidence.json). Run tools/validate_release.py "
            "to qualify this checkpoint.", sample_mode, qp)
        return
    rec = json.loads(qp.read_text()).get("modes", {}).get(sample_mode)
    if rec is not None and not rec.get("qualified", False):
        raise RuntimeError(
            f"sample_mode={sample_mode!r} REFUSED for {weight_path}: measured "
            f"deltas vs exact bilinear exceeded the qualification budget "
            f"({rec.get('delta_pts')}, artifact {qp}). Use --sample_mode "
            "bilinear, or re-run tools/validate_release.py to re-qualify.")


def build_m2f_forward(cfg: Config, weight_path: Optional[str],
                      spatial_devices: int = 0, sample_mode: str = "bilinear",
                      enforce_qualification: bool = True,
                      score_lowres: bool = False, score_topq: int = 0):
    """``sample_mode``: 'bilinear' (exact, reference parity — the default and
    the certified path), or an accuracy-measured fast path: 'nearest'
    (approximate sampling), 'nearest_top{T}' (top-T point pruning, fastest
    qualified family), 'int8' (int8 value table), a comma-separated per-layer
    hybrid — or 'shared' (REFUSED: measured −13..−16pt AUPRC on trained
    checkpoints, kept only for measurement).

    Accuracy evidence (PERF.md round 5; outputs/r5/m2f_evidence_ci.json,
    32-image val, paired bootstrap CIs): int8 deltas ~0.0±0.1pt (certified at
    compact scale); nearest/top-K carry REAL sub-pt degradations (AUPRC
    −0.4..−1.1pt, FPR95 +0.3..+1.3pt) at compact scale — the compact harness
    MEASURES them, it cannot certify the reference's ±0.5-pt budget. The
    binding certification is the automatic per-checkpoint release gate
    (tools/validate_release.py + check_sampling_qualification below) the
    moment real weights/datasets are available.

    ``score_lowres=True`` scores the anomaly branch at mask resolution and
    upsamples the score map (see ``models.maskformer.inference``) — an
    approximate fast path gated exactly like the sampling modes, under the
    qualification key ``{sample_mode}+lowres``. Compact-scale verdict
    (outputs/r5/m2f_evidence_ci2.json): REFUSED — AUPRC −5.7 pt / FPR95
    +10 pt; the stride-4 boundary softening is large relative to that
    harness's 16-24 px anomalies. ``score_topq=Q`` instead upsamples only
    the Q largest-mass OOD queries at FULL resolution (key
    ``{sample_mode}+topq{Q}``) — the bounded-error fast path built after
    that refusal.

    ``enforce_qualification=False`` bypasses the per-checkpoint refusal gate
    — for the qualification measurement itself (tools/validate_release.py),
    which must be able to re-measure a previously-refused mode."""
    from ..models.maskformer import inference
    from ..train.m2f_trainer import TrainM2FOOD

    if enforce_qualification:
        qual_key = sample_mode + ("+lowres" if score_lowres else "") + (
            f"+topq{score_topq}" if score_topq else "")
        check_sampling_qualification(weight_path, qual_key)
    trainer = TrainM2FOOD(cfg, weight_path)
    model, variables = trainer.model, trainer.variables
    def _valid(mode: str) -> bool:
        if mode in ("bilinear", "nearest", "shared"):
            return True
        if mode.startswith("nearest_top"):
            # nearest_top{T} (renormalized pruning) or nearest_top{T}c
            # (centroid-tail-corrected pruning, see ops/ms_deform_attn.py)
            spec = mode[len("nearest_top"):]
            return spec.isdigit() or (spec.endswith("c")
                                      and spec[:-1].isdigit())
        return False

    if sample_mode == "int8":
        model = model.clone(quantize_deform_table=True)
    elif "," in sample_mode:
        # per-encoder-layer hybrid, e.g. "bilinear,bilinear,nearest_top6,..."
        modes = tuple(s.strip() for s in sample_mode.split(","))
        if not all(_valid(s) for s in modes):
            raise ValueError(f"unknown mode in hybrid sample_mode {modes}")
        model = model.clone(deform_sample_mode=modes)
    elif _valid(sample_mode):
        if sample_mode != "bilinear":
            model = model.clone(deform_sample_mode=sample_mode)
    else:
        raise ValueError(f"unknown sample_mode {sample_mode!r}")
    num_classes = model.num_classes

    def fwd(variables, img):
        outputs = model.apply(variables, img, train=False)
        sem, anomaly = inference(outputs, img.shape[1:3],
                                 num_classes=num_classes,
                                 score_lowres=score_lowres,
                                 score_topq=score_topq)
        return anomaly, sem

    if spatial_devices:
        # res5 stride 32: every pyramid level must shard evenly
        return spatial_jit(fwd, variables, spatial_devices, min_stride=32)

    def fwd_mapped(variables, img):
        # Measured on v5e (PERF.md round 4): the gather-bound deformable
        # program loses its layout at batch > 1 and collapses ~3x (2.94
        # img/s at batch 2 vs 8.4 at batch 1, same phase). lax.map keeps the
        # batch-1 layout inside one jitted program: batch-4 eval measured at
        # per-image parity with batch 1 (8.441 vs 8.429 img/s), so batched
        # buckets ride the fast path with one dispatch per bucket.
        def one(im):
            a, s = fwd(variables, im[None])
            return a[0], s[0]

        return jax.lax.map(one, img)

    jf = jax.jit(fwd_mapped)
    return lambda img: jf(variables, img)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", choices=["deeplab", "m2f"], required=True)
    parser.add_argument("--cfg", default=None)
    parser.add_argument("--id", default="eval")
    parser.add_argument("--weight_path", default=None)
    parser.add_argument("--test_dataset", default=None)
    parser.add_argument("--tta", action="store_true",
                        help="horizontal-flip test-time augmentation")
    parser.add_argument("--spatial", type=int, default=0, metavar="N",
                        help="shard each image's height over an N-device mesh "
                             "(single-image latency scaling; 0 = off)")
    parser.add_argument("--save_outputs", default=None, metavar="DIR",
                        help="write per-image anomaly score maps (.npy) and "
                             "colorized predictions (.png) under DIR/<dataset>/")
    parser.add_argument("--sample_mode", default="bilinear",
                        help="m2f deformable sampling: bilinear = exact "
                             "reference parity (default); nearest / "
                             "nearest_top{T} / int8 = accuracy-measured fast "
                             "paths (compact-scale deltas + CIs in "
                             "outputs/r5/m2f_evidence_ci.json; per-checkpoint "
                             "certification via tools/validate_release.py); "
                             "a comma-separated list gives a per-encoder-"
                             "layer hybrid; shared = measured-refused")
    parser.add_argument("--score_lowres", action="store_true",
                        help="m2f: score the anomaly branch at mask "
                             "resolution and upsample the score map "
                             "(approximate; qualified per checkpoint under "
                             "the '<sample_mode>+lowres' key; REFUSED at "
                             "compact scale, outputs/r5)")
    parser.add_argument("--score_topq", type=int, default=0, metavar="Q",
                        help="m2f: upsample only the Q largest-mass OOD "
                             "queries for the anomaly score (bounded-error "
                             "fast path; qualified per checkpoint under the "
                             "'<sample_mode>+topq{Q}' key)")
    args = parser.parse_args()

    from ..utils import enable_compilation_cache

    enable_compilation_cache()  # whole-image eval programs compile in minutes
    logging.basicConfig(level=logging.INFO)
    cfg = load_config(args.cfg, args.id)
    if args.model == "deeplab":
        fwd = build_deeplab_forward(cfg, args.weight_path,
                                    spatial_devices=args.spatial)
    else:
        fwd = build_m2f_forward(cfg, args.weight_path,
                                spatial_devices=args.spatial,
                                sample_mode=args.sample_mode,
                                score_lowres=args.score_lowres,
                                score_topq=args.score_topq)

    d = cfg.data
    roots = {
        "CityscapesVal": d.cityscapes_root,
        "RoadAnomaly": d.road_anomaly_root,
        "RoadAnomaly21": d.anomaly_track_root,
        "RoadObstacle21": d.obstacle_track_root,
        "MUAD": d.muad_root,
        "ACDC_POC": d.acdc_root,
    }
    ev = OODEvaluator(cfg, fwd, roots, tta=args.tta, save_dir=args.save_outputs,
                      bucket_multiple=spatial_bucket_multiple(
                          args.spatial,
                          min_stride=32 if args.model == "m2f" else 8))
    default_names = DEFAULT_DATASETS if args.model == "deeplab" else DEFAULT_DATASETS_M2F
    names = (args.test_dataset,) if args.test_dataset else default_names
    results = ev.test_all(names)
    print(results)


if __name__ == "__main__":
    main()
