"""Learning-evidence run: the two-stage RCL recipe on synthetic data with real
signal, demonstrating the OOD objective actually trains.

Builds a tiny Cityscapes-layout dataset where the generated half contains a
visually distinct anomaly patch labelled 254 (the CG-Aug contract), runs the
REAL ``TrainDeepLabOOD`` loop (paired loader, stage schedule, RCL, best-AUPRC
checkpointing) on a small WRN trunk, and reports validation AUPRC per epoch.
Success = AUPRC climbs from ~chance to near 1.0 — evidence that the RCL
gradient path (energy head <- -logsumexp <- contrastive terms) is wired
correctly end-to-end, complementing the per-component torch-parity oracles.

Usage: python tools/learning_demo.py [--model deeplab|m2f] [--epochs 12]
Prints one JSON line {"auprc_untrained", "auprc_best", "improved", ...}.

Round-4 additions (VERDICT r3 #1b/#4):
- stage attribution (m2f): per-epoch val metrics from the trainer's
  scalars.csv split by stage, isolating what stage 2 (official SetCriterion
  loss with RCL plugged in) contributes beyond stage 1 (RCL through
  ``get_anomaly_score``).
- ``--qualify_sampling`` (m2f): after training, reload the best checkpoint
  and evaluate EXACT AUROC/AUPRC/FPR95 under each deformable sampling mode
  (bilinear reference vs nearest vs int8-table) — the trained-checkpoint
  metric-delta table that accuracy-qualifies the approximate eval fast paths
  end-to-end (the prior gate was band-limited feature error only).
"""

import argparse
import json
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np
from PIL import Image

TINY_TRUNK = dict(
    trunk_structure=(1, 1, 1, 1, 1, 1),
    trunk_channels=((8, 8), (8, 8), (16, 16), (16, 16), (8, 16, 32), (16, 32, 64)),
)


def build_data(root: Path, n_train: int = 16, n_val: int = 6, hw: int = 96):
    rng = np.random.RandomState(0)
    city = root / "cityscapes"
    gen = root / "DTWP"
    track = root / "anomaly_track"

    def scene(r):
        """Structured road scene: sky / road / building bands + texture."""
        img = np.zeros((hw, hw, 3), np.float32)
        img[: hw // 3] = (0.4, 0.5, 0.7)      # sky
        img[hw // 3: 2 * hw // 3] = (0.3, 0.3, 0.3)  # building
        img[2 * hw // 3:] = (0.45, 0.4, 0.45)  # road
        img += r.randn(hw, hw, 3) * 0.05
        lab = np.zeros((hw, hw), np.uint8)
        lab[: hw // 3] = 10
        lab[hw // 3: 2 * hw // 3] = 2
        lab[2 * hw // 3:] = 0
        return img, lab

    def anomaly(img, lab, r):
        """Bright saturated patch on the road = the pasted OOD object."""
        y = int(r.randint(2 * hw // 3, hw - 18))
        x = int(r.randint(0, hw - 18))
        img[y: y + 16, x: x + 16] = (0.95, 0.1, 0.1)
        lab[y: y + 16, x: x + 16] = 254
        return img, lab

    def save(img, lab, ip, lp):
        ip.parent.mkdir(parents=True, exist_ok=True)
        lp.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(ip)
        Image.fromarray(lab).save(lp)

    for i in range(n_train):
        stem = f"aachen_{i:06d}_000019"
        r = np.random.RandomState(100 + i)
        img, lab = scene(r)
        save(img, lab,
             city / "leftImg8bit" / "train" / "aachen" / f"{stem}_leftImg8bit.png",
             city / "gtFine" / "train" / "aachen" / f"{stem}_gtFine_labelTrainIds.png")
        gi, gl = anomaly(*scene(r), r)
        save(gi, gl,
             gen / "leftImg8bit" / "train" / "aachen" / f"{stem}_x_leftImg8bit.png",
             gen / "gtFine" / "train" / "aachen" / f"{stem}_x_gtFine_labelTrainIds.png")

    for i in range(n_val):
        r = np.random.RandomState(900 + i)
        img, lab = anomaly(*scene(r), r)
        ood = (lab == 254).astype(np.uint8)
        ip = track / "images" / f"val{i}.jpg"
        lp = track / "labels_masks" / f"val{i}_labels_semantic.png"
        ip.parent.mkdir(parents=True, exist_ok=True)
        lp.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(ip)
        Image.fromarray(ood).save(lp)

    return {"cityscapes": str(city), "generation": str(gen), "track": str(track)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["deeplab", "m2f"], default="deeplab")
    ap.add_argument("--backbone", default=None,
                    help="m2f backbone override, e.g. swin_tiny — executes the "
                         "Swin fine-tune path (drop-path + dropout rngs) "
                         "through the REAL two-stage recipe")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--warmup", type=int, default=None,
                    help="stage-1 epochs (default epochs//2). From-scratch "
                         "backbones (no pretrained checkpoint) need a SHORT "
                         "stage 1: it trains only the OOD classification head "
                         "while every other parameter is random")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--qualify_sampling", action="store_true",
                    help="m2f: after training, measure exact OOD metrics on "
                         "the best checkpoint under bilinear / nearest / "
                         "shared / int8-table deformable sampling")
    ap.add_argument("--n_val", type=int, default=6,
                    help="anomaly val images. Per-image seeds (900+i) make "
                         "enlargement stable: the first 6 stay identical, so "
                         "a --reuse'd checkpoint (selected on those 6) can be "
                         "re-qualified on a larger held-out set for tighter "
                         "delta statistics")
    ap.add_argument("--enc_layers", type=int, default=1,
                    help="m2f deformable encoder depth (>1 makes per-layer "
                         "HYBRID sampling modes measurable in the "
                         "qualification table)")
    ap.add_argument("--pretrain", type=int, default=0, metavar="N",
                    help="m2f: FIRST pretrain a closed-set semantic model "
                         "(TrainM2FInstance, vanilla decoder) N epochs on the "
                         "synthetic world, then transfer every matching "
                         "parameter into the OOD model before the two-stage "
                         "fine-tune — the offline analogue of the reference's "
                         "pretrained-checkpoint premise (train_m2f.py warmup "
                         "stage trains the OOD head on TRAINED features). "
                         "Measured negative at miniature scale "
                         "(outputs/r5/swin_evidence.json): 40 steps of "
                         "closed-set pretraining produce no usable features "
                         "and the transfer costs stage-2 epochs")
    ap.add_argument("--pretrain_ood", type=int, default=0, metavar="N",
                    help="m2f: strongest offline construction of the "
                         "pretrained premise — FIRST run the full two-stage "
                         "OOD recipe N epochs (the configuration that "
                         "demonstrably learns at this scale), then restart "
                         "the two-stage recipe FROM that checkpoint with "
                         "class_embed2 RE-SEEDED from class_embed (the "
                         "reference's init, train_m2f.py:301-317): stage 1 "
                         "(OOD head only) now trains a fresh head on TRAINED "
                         "features, so it should move AUPRC by itself")
    ap.add_argument("--reuse", action="store_true",
                    help="skip training when the workdir already holds an "
                         "AUPRC_best checkpoint (fast qualification re-runs; "
                         "requires --workdir)")
    ap.add_argument("--adapt_shared", type=int, default=0, metavar="N",
                    help="m2f: deployment calibration for the shared fast "
                         "path — fine-tune the trained checkpoint N epochs "
                         "WITH shared sampling active (downstream weights "
                         "recalibrate to the collapsed sampling geometry), "
                         "then re-gate the adapted checkpoint against the "
                         "ORIGINAL exact-bilinear metrics")
    ap.add_argument("--out", default=None, help="also write the JSON here")
    args = ap.parse_args()

    import logging

    logging.basicConfig(level=logging.WARNING, stream=sys.stderr)
    work = Path(args.workdir or tempfile.mkdtemp(prefix="learning_demo_"))
    roots = build_data(work, n_val=args.n_val)

    import os

    os.chdir(work)  # ckpts/<id> land in the workdir

    from multishiftseg_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # repeat runs reuse the compiled stage programs

    from multishiftseg_tpu.core.config import load_config

    def demo_cfg(exp_id, epochs, warmup):
        c = load_config(str(REPO / "exps" / f"{args.model}.yaml"),
                        exp_id=exp_id)
        c.data.cityscapes_root = roots["cityscapes"]
        c.data.generation_root = roots["generation"]
        c.data.anomaly_track_root = roots["track"]
        c.data.coco_root = str(work / "no_coco")
        c.data.crop_size = (64, 64)
        c.train.n_epochs = epochs
        c.train.warmup_epoch = warmup
        c.train.train_batch = 4
        c.train.lr = 1e-3  # tiny model, tiny data: faster than the 1e-4 recipe
        c.train.bf16 = False
        c.data.num_workers = 2
        c.loss.params["num_pair_samples"] = 512
        return c

    cfg = demo_cfg("learning_demo", args.epochs,
                   (args.warmup if args.warmup is not None
                    else max(args.epochs // 2, 1)))

    pretrain_info = None
    if args.model == "deeplab":
        from multishiftseg_tpu.models.deeplab import DeepWV3Plus
        from multishiftseg_tpu.train.deeplab_trainer import TrainDeepLabOOD

        model = DeepWV3Plus(num_classes=19, **TINY_TRUNK)
        trainer = TrainDeepLabOOD(cfg, model=model)
    else:
        from multishiftseg_tpu.models.maskformer import MaskFormer
        from multishiftseg_tpu.train.m2f_trainer import (
            TrainM2FOOD, copy_class_embed_to_ood)

        cfg.model.m2f.train_num_points = 256
        kw = {}
        if args.backbone:
            kw["backbone"] = args.backbone
            cfg.model.m2f.backbone = args.backbone
        model = MaskFormer(num_classes=19, hidden_dim=32, num_queries=24,
                           nheads=4, dim_feedforward=64, dec_layers=3,
                           mask_dim=32, transformer_enc_layers=args.enc_layers,
                           **kw)
        trainer = TrainM2FOOD(cfg, model=model)

        if args.pretrain:
            # closed-set premise: train the SAME architecture (vanilla
            # decoder) on the world's semantic task, then transfer every
            # matching parameter — backbone, pixel decoder, and the shared
            # predictor subtrees — into the OOD model. copy_class_embed_to_ood
            # below then seeds class_embed2 from the TRAINED classifier, so
            # stage 1 (class_embed2-only RCL warmup) runs on trained features,
            # matching the reference's pretrained-checkpoint semantics
            # (train_m2f.py:301-317).
            from multishiftseg_tpu.train.instance_trainer import TrainM2FInstance

            cfg_sem = load_config(str(REPO / "exps" / "m2f_semantic.yaml"),
                                  exp_id="learning_demo_pretrain")
            cfg_sem.data.cityscapes_root = roots["cityscapes"]
            cfg_sem.data.crop_size = (64, 64)
            cfg_sem.train.n_epochs = args.pretrain
            cfg_sem.train.train_batch = 4
            cfg_sem.train.bf16 = False
            cfg_sem.data.num_workers = 2
            if args.backbone:
                cfg_sem.model.m2f.backbone = args.backbone
            model_pre = model.clone(predictor="vanilla")
            pre = TrainM2FInstance(cfg_sem, model=model_pre)
            pre_result = pre.train()

            def merge_params(dst, src):
                """Copy src leaves into dst wherever the path exists with a
                matching shape (vanilla->GMA decoder: the GMA extras stay at
                their init)."""
                moved = 0
                out = {}
                for k, v in dst.items():
                    if isinstance(v, dict) and isinstance(src.get(k), dict):
                        out[k], m = merge_params(v, src[k])
                        moved += m
                    elif (k in src and getattr(src[k], "shape", None)
                          == getattr(v, "shape", ())):
                        out[k] = src[k]
                        moved += 1
                    else:
                        out[k] = v
                return out, moved

            import jax

            merged, n_moved = merge_params(trainer.variables["params"],
                                           pre.variables["params"])
            n_total = len(jax.tree_util.tree_leaves(
                trainer.variables["params"]))
            trainer.variables["params"] = merged
            if trainer.variables.get("batch_stats") is not None and \
                    pre.variables.get("batch_stats") is not None:
                trainer.variables["batch_stats"], _ = merge_params(
                    trainer.variables["batch_stats"],
                    pre.variables["batch_stats"])
            pretrain_info = {"epochs": args.pretrain,
                             "final_loss": round(float(pre_result["loss"]), 4),
                             "transferred_leaves": n_moved,
                             "total_leaves": n_total}

        if args.pretrain_ood:
            cfg_pre = demo_cfg("learning_demo_preood", args.pretrain_ood,
                               max(args.pretrain_ood // 6, 1))
            cfg_pre.model.m2f = cfg.model.m2f
            pre_ood = TrainM2FOOD(cfg_pre, model=model)
            pre_ood.variables["params"] = copy_class_embed_to_ood(
                pre_ood.variables["params"])
            pre_best = pre_ood.train()
            raw_pre = pre_ood.ckpt.restore("AUPRC_best")
            trainer.variables = {"params": raw_pre["params"]}
            if raw_pre.get("batch_stats") is not None:
                trainer.variables["batch_stats"] = raw_pre["batch_stats"]
            pretrain_info = {"ood_pretrain_epochs": args.pretrain_ood,
                             "ood_pretrain_best_auprc":
                                 round(float(pre_best["AUPRC"]), 4)}

        # the reference initializes the OOD head by weight copy (stage 1
        # trains class_embed2 only, so it must start from class_embed) —
        # after an --pretrain_ood run this RE-SEEDS the trained OOD head,
        # so stage 1 retrains it from the classifier on trained features
        trainer.variables["params"] = copy_class_embed_to_ood(
            trainer.variables["params"])

    # BEFORE-training baseline: DeepLab's untrained energy score is chance;
    # M2F's max-softmax uncertainty separates unusual patches partly zero-shot
    # (the Mask2Anomaly premise), so its improvement window is smaller
    from multishiftseg_tpu.data.anomaly import RoadAnomaly21
    from multishiftseg_tpu.data.transforms import Compose, Normalize, ToTensor
    from multishiftseg_tpu.train.validation import batched_valid

    test_tf = Compose([ToTensor(), Normalize(mean=cfg.data.mean,
                                             std=cfg.data.std)])
    val_ds = RoadAnomaly21(root=cfg.data.anomaly_track_root, transform=test_tf)
    if args.reuse and trainer.ckpt.exists("AUPRC_best"):
        raw = trainer.ckpt.restore("AUPRC_best")
        trainer.variables = {"params": raw["params"],
                             "batch_stats": raw.get("batch_stats")}
        best = {"AUPRC": float(raw.get("best_auprc", float("nan")))}
        baseline = float("nan")
    else:
        if args.model == "deeplab":
            base = batched_valid(
                val_ds, lambda im: trainer.eval_step(trainer.variables, im)[0])
        else:
            ev = trainer.make_eval_step()
            base = batched_valid(
                val_ds, lambda im: ev(trainer.variables, im)[1])
        baseline = base["AUPRC"] if base else float("nan")

        best = trainer.train()
    out = {
        "auprc_untrained": round(baseline, 4),
        "auprc_best": round(best["AUPRC"], 4),
        **({"pretrain": pretrain_info} if pretrain_info else {}),
        # on --reuse the untrained baseline is not re-measured (nan): fall
        # back to "the stored best is far above chance"
        "improved": bool(best["AUPRC"] > baseline + 0.05
                         if baseline == baseline else best["AUPRC"] > 0.1),
    }

    # ---- stage attribution: per-epoch val AUPRC split by stage -------------
    # (scalars.csv is written by the trainer; 'stage' rows exist for m2f)
    scalars_path = Path(cfg.model_dir) / "scalars.csv"
    if scalars_path.exists():
        from multishiftseg_tpu.core.logging import ScalarWriter

        w = ScalarWriter(cfg.model_dir)
        curves = w.read()
        w.close()
        auprc = dict(curves.get("val/AUPRC", []))
        stages = dict(curves.get("stage", []))
        warm = cfg.train.warmup_epoch
        s1 = [v for e, v in auprc.items()
              if stages.get(e, 0 if e < warm else 1) == 0]
        s2 = [v for e, v in auprc.items()
              if stages.get(e, 0 if e < warm else 1) == 1]
        out["stage_attribution"] = {
            "stage1_end_auprc": round(s1[-1], 4) if s1 else None,
            "stage1_best_auprc": round(max(s1), 4) if s1 else None,
            "stage2_best_auprc": round(max(s2), 4) if s2 else None,
            "stage2_gain_over_stage1_best": (
                round(max(s2) - max(s1), 4) if s1 and s2 else None),
        }

    # ---- sampling-mode qualification on the TRAINED checkpoint -------------
    if args.qualify_sampling and args.model == "m2f":
        import jax
        import jax.numpy as jnp

        from multishiftseg_tpu.evals.ood_metrics import eval_ood_measure
        from multishiftseg_tpu.models.maskformer import inference

        raw = trainer.ckpt.restore("AUPRC_best")
        variables = {"params": raw["params"],
                     "batch_stats": raw.get("batch_stats")}

        per_image = {}  # mode -> (list of per-image scores, shared gts)

        def exact_metrics(m, vs, mode_name=None, score_lowres=False,
                          score_topq=0):
            """EXACT OOD metrics of model ``m`` with variables ``vs`` on the
            held-out anomaly set (the qualification measurement). Per-image
            score arrays are retained for the paired bootstrap below."""
            @jax.jit
            def score_fn(vs, img):
                outputs = m.apply(vs, img, train=False)
                _, anomaly = inference(outputs, img.shape[1:3],
                                       num_classes=m.num_classes,
                                       score_lowres=score_lowres,
                                       score_topq=score_topq)
                return anomaly

            scores, gts = [], []
            for i in range(len(val_ds)):
                img, tgt = val_ds[i][:2]
                a = np.asarray(score_fn(vs, jnp.asarray(img[None])))[0]
                scores.append(a.reshape(-1))
                gts.append(np.asarray(tgt).reshape(-1))
            if mode_name is not None:
                per_image[mode_name] = (scores, gts)
            res = eval_ood_measure(np.concatenate(scores),
                                   np.concatenate(gts))
            return {"AUROC": round(res[0], 5), "AUPRC": round(res[1], 5),
                    "FPR_TPR95": round(res[2], 5)}

        def bootstrap_delta_ci(mode_name, n_boot=100, seed=17):
            """Paired 95% CI of (mode - bilinear) metric deltas: resample the
            val IMAGES with replacement, using the SAME resample indices for
            both modes, and take percentiles of the per-resample deltas. A CI
            straddling 0 means the val set cannot resolve the mode's delta at
            that metric — the binding adjudication is then the per-checkpoint
            release gate on real weights (tools/validate_release.py)."""
            sc_m, gt = per_image[mode_name]
            sc_b, _ = per_image["bilinear"]
            n = len(gt)
            rng_b = np.random.RandomState(seed)
            deltas = {"AUROC": [], "AUPRC": [], "FPR_TPR95": []}
            for _ in range(n_boot):
                idx = rng_b.randint(0, n, n)
                g = np.concatenate([gt[i] for i in idx])
                rm = eval_ood_measure(
                    np.concatenate([sc_m[i] for i in idx]), g)
                rb = eval_ood_measure(
                    np.concatenate([sc_b[i] for i in idx]), g)
                for k, j in (("AUROC", 0), ("AUPRC", 1), ("FPR_TPR95", 2)):
                    deltas[k].append(rm[j] - rb[j])
            return {k: [round(float(np.percentile(v, 2.5)), 5),
                        round(float(np.percentile(v, 97.5)), 5)]
                    for k, v in deltas.items()}

        modes = {
            "bilinear": dict(deform_sample_mode="bilinear"),
            "nearest": dict(deform_sample_mode="nearest"),
            "shared": dict(deform_sample_mode="shared"),
            "int8_table": dict(quantize_deform_table=True),
            # top-K point pruning: error bounded by the dropped softmax mass
            # (J = n_levels * n_points = 12 candidate points per head)
            "nearest_top6": dict(deform_sample_mode="nearest_top6"),
            "nearest_top8": dict(deform_sample_mode="nearest_top8"),
            # centroid-tail-corrected pruning: kept weights exact, dropped
            # tail approximated at its weighted centroid (one extra row per
            # head x level) — built because the r5 gate measured plain top-K's
            # renormalization outside the budget (ops/ms_deform_attn.py)
            "nearest_top4c": dict(deform_sample_mode="nearest_top4c"),
            "nearest_top6c": dict(deform_sample_mode="nearest_top6c"),
            # low-res scoring fast path (anomaly scored at mask resolution,
            # score map upsampled) alone and composed with the fastest
            # qualified sampling mode — the candidate production combos
            "bilinear+lowres": dict(score_lowres=True),
            "nearest+lowres": dict(deform_sample_mode="nearest",
                                   score_lowres=True),
            "nearest_top6c+lowres": dict(deform_sample_mode="nearest_top6c",
                                         score_lowres=True),
            # query pruning at full resolution: only the Q largest-mass OOD
            # queries are upsampled (bounded error = dropped non-void mass;
            # built after lowres was refused at this scale). The harness's
            # compact model has 24 queries, so topq prunes 24 -> Q here and
            # 100 -> Q at production scale.
            "bilinear+topq8": dict(score_topq=8),
            "nearest+topq8": dict(deform_sample_mode="nearest",
                                  score_topq=8),
            "nearest+topq16": dict(deform_sample_mode="nearest",
                                   score_topq=16),
        }
        # MSS_QUAL_MODES=a,b,c filters the measured modes and
        # MSS_QUAL_BOOT=N sets the bootstrap resample count (0 = skip CIs):
        # the full 12-mode x 100-resample table takes ~45 min on a 1-core
        # host; a targeted gate run needs minutes.
        sel = os.environ.get("MSS_QUAL_MODES", "")
        if sel:
            keep = set(s.strip() for s in sel.split(",")) | {"bilinear"}
            modes = {k: v for k, v in modes.items() if k in keep}
        n_boot_env = int(os.environ.get("MSS_QUAL_BOOT", "100"))
        E = model.transformer_enc_layers
        if E >= 2:
            # per-layer hybrids: approximation injected LATE propagates
            # through fewer downstream layers
            modes["hybrid_nearest_shared"] = dict(deform_sample_mode=(
                ("nearest",) * (E // 2) + ("shared",) * (E - E // 2)))
            modes["hybrid_nearest_top6"] = dict(deform_sample_mode=(
                ("nearest",) * (E // 2) + ("nearest_top6",) * (E - E // 2)))
            modes["hybrid_exact_nearest"] = dict(deform_sample_mode=(
                ("bilinear",) * (E // 2) + ("nearest",) * (E - E // 2)))
        def measure(name, ov):
            ov = dict(ov)
            lowres = ov.pop("score_lowres", False)
            topq = ov.pop("score_topq", 0)
            return exact_metrics(model.clone(**ov) if ov else model,
                                 variables, mode_name=name,
                                 score_lowres=lowres, score_topq=topq)

        table = {name: measure(name, ov) for name, ov in modes.items()}
        ref = table["bilinear"]

        def add_delta(name):
            table[name]["delta_vs_bilinear"] = {
                k: round(table[name][k] - ref[k], 5) for k in ref}
            if name in per_image and n_boot_env:
                table[name]["delta_ci95"] = bootstrap_delta_ci(
                    name, n_boot=n_boot_env)

        for mode_name in [k for k in table if k != "bilinear"]:
            add_delta(mode_name)

        # ---- shared-mode deployment calibration (--adapt_shared N) --------
        # The r5 gate measured raw shared sampling far outside the ±0.5-pt
        # budget (AUPRC −16pt): trained heads sample genuinely different
        # locations, so collapsing them to a centroid needs the downstream
        # weights to recalibrate. Fine-tune WITH shared sampling active from
        # the best checkpoint, then re-gate the ADAPTED checkpoint against
        # the ORIGINAL exact-bilinear metrics — the production contract is
        # "fast path + calibration ≈ exact path".
        if args.adapt_shared:
            from multishiftseg_tpu.train.m2f_trainer import TrainM2FOOD

            cfg_a = demo_cfg("learning_demo_adapt", args.adapt_shared, 0)
            tr2 = TrainM2FOOD(cfg_a,
                              model=model.clone(deform_sample_mode="shared"))
            tr2.variables = {"params": raw["params"],
                             "batch_stats": raw.get("batch_stats")}
            tr2.train()
            raw2 = tr2.ckpt.restore("AUPRC_best")
            vs2 = {"params": raw2["params"],
                   "batch_stats": raw2.get("batch_stats")}
            table["shared_adapted"] = exact_metrics(
                model.clone(deform_sample_mode="shared"), vs2)
            table["shared_adapted"]["adapt_epochs"] = args.adapt_shared
            add_delta("shared_adapted")
            # does calibration cost the exact path? (informational)
            table["bilinear_after_adapt"] = exact_metrics(model, vs2)
            add_delta("bilinear_after_adapt")
        out["sampling_qualification"] = table

    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return 0 if out["improved"] else 1


if __name__ == "__main__":
    sys.exit(main())
