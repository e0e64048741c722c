"""CG-Aug ablation: does training WITH the generated data improve OOD detection?

This closes the paper's loop (VERDICT r3 #2) — the reference's entire premise
is that the paired clean/generated batch driving RCL improves pixel-level OOD
detection (``/root/reference/train_deeplab.py:194-195``,
``lib/dataset/cityscapes.py:114-137``). Offline protocol, fully executable
without the released weights:

  1. Build a structured synthetic road-scene world where the image is a
     learnable function of the label (cgaug_quality_eval's scenes).
  2. Train the compact CG-Aug backends (seg-conditioned diffusion + box-prompt
     segmenter) on the clean world.
  3. Generate a CG-Aug training set: anomaly shapes pasted in label space,
     diffusion-rendered, SAM-IoU filtered, OOD pixels labelled 254 — the
     ``DiverseCityscapes`` generation_root contract.
  4. Train the REAL ``TrainDeepLabOOD`` recipe twice per seed, identical in
     everything except the generated half of the pair:
        arm "cgaug": generated half = the CG-Aug images (254-labelled OOD)
        arm "clean": generated half = a copy of the clean image + clean label
     (the "without generated data" control — same pairing structure, same
     loader, same loss; no semantic-shift supervision).
  5. Evaluate both arms on HELD-OUT anomaly images (never trained on) from
     two sources: (a) fresh CG-Aug generations (the generation-distribution
     val) and (b) deterministic renders with pasted solid-shape anomalies
     (the transfer val — anomaly appearance the diffusion never produced).

Prints one JSON line {"arms": {...}, "gap": {...}, "seeds": [...]}; also
writes the artifact to --out.
"""

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import numpy as np
from PIL import Image

from cgaug_quality_eval import ShapeSource, build_paste_bank, synth_scene

TINY_TRUNK = dict(
    trunk_structure=(1, 1, 1, 1, 1, 1),
    trunk_channels=((16, 16), (16, 16), (32, 32), (32, 32),
                    (16, 32, 64), (32, 64, 128)),
)


def build_world(work: Path, n_train: int, h: int, w: int,
                domain_randomize: bool = False):
    """Clean Cityscapes-layout world: train images/labels + color labels."""
    rng = np.random.default_rng(0)
    city = work / "cityscapes"
    for i in range(n_train):
        img, color, tid = synth_scene(rng, h, w,
                                      domain_randomize=domain_randomize)
        stem = f"synth_{i:06d}_000019"
        p = city / "leftImg8bit" / "train" / "synth" / f"{stem}_leftImg8bit.png"
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(img).save(p)
        q = city / "gtFine" / "train" / "synth"
        q.mkdir(parents=True, exist_ok=True)
        Image.fromarray(color).save(q / f"{stem}_gtFine_color.png")
        Image.fromarray(tid).save(q / f"{stem}_gtFine_labelTrainIds.png")
    return city


def render_transfer_val(work: Path, n: int, h: int, w: int, seed: int = 500,
                        domain_randomize: bool = False):
    """Held-out "real-world" anomalies: deterministic renders + pasted solid
    shapes with an appearance family the diffusion never produced.

    With ``domain_randomize`` the scenes are HELD-OUT draws from the same
    appearance family as the training world (fresh rng) — appearance
    transfer, not domain identity: the anomaly paste itself stays an
    appearance the diffusion never produced."""
    rng = np.random.default_rng(seed)
    src = ShapeSource()
    track = work / "val_transfer"
    (track / "images").mkdir(parents=True, exist_ok=True)
    (track / "labels_masks").mkdir(parents=True, exist_ok=True)
    for i in range(n):
        img, _, tid = synth_scene(rng, h, w,
                                  domain_randomize=domain_randomize)
        m, _ = src.sample(rng)
        # scale the 96x96 shape to ~1/4 image height, paste on the road band
        sh = max(16, h // 4)
        mm = np.asarray(Image.fromarray(m * 255).resize((sh, sh),
                                                        Image.NEAREST)) > 127
        y0 = int(rng.integers(2 * h // 3, h - sh)) if h - sh > 2 * h // 3 else h - sh
        x0 = int(rng.integers(0, w - sh))
        color = np.array([rng.integers(160, 255), rng.integers(0, 80),
                          rng.integers(120, 255)], np.uint8)  # saturated magenta-ish
        region = img[y0:y0 + sh, x0:x0 + sh]
        region[mm] = color
        ood = np.zeros((h, w), np.uint8)
        ood[y0:y0 + sh, x0:x0 + sh][mm] = 1
        Image.fromarray(img).save(track / "images" / f"val{i}.jpg")
        Image.fromarray(ood).save(track / "labels_masks"
                                  / f"val{i}_labels_semantic.png")
    return track


def render_transfer_diffbg(work: Path, diffusion, val_city: Path, val_stems,
                           h: int, w: int, seed: int = 700):
    """Attribution track for a chance-level transfer val: held-out scenes
    rendered through the TRAINED DIFFUSION (no anomaly in label space), with
    the SAME solid-paste protocol as ``render_transfer_val`` applied to the
    rendered image. If the CG-Aug arm detects solid pastes here but not on
    the clean-rendered transfer val, the failure is BACKGROUND-DOMAIN shift
    (the model only scores OOD against diffusion-textured backgrounds); if it
    fails on both, the failure is ANOMALY-APPEARANCE shift (solid pastes are
    an appearance family the 254-supervision never contained)."""
    from multishiftseg_tpu.cgaug.generate import GenerationConfig
    from multishiftseg_tpu.cgaug.label_ops import cityscapes_to_ade20k
    from multishiftseg_tpu.cgaug.prompts import get_prompt

    gcfg = GenerationConfig()
    rng = np.random.default_rng(seed)
    src = ShapeSource()
    track = work / "val_transfer_diffbg"
    (track / "images").mkdir(parents=True, exist_ok=True)
    (track / "labels_masks").mkdir(parents=True, exist_ok=True)
    for i, stem in enumerate(val_stems):
        color = np.asarray(Image.open(
            val_city / "gtFine" / "train" / "synth"
            / f"{stem}_gtFine_color.png").convert("RGB"))
        ade, _ = cityscapes_to_ade20k(color)
        prompt, _ = get_prompt(gcfg.weathers, gcfg.places, rng)
        img = np.asarray(diffusion.generate(ade, prompt)).copy()
        m, _ = src.sample(rng)
        sh = max(16, h // 4)
        mm = np.asarray(Image.fromarray(m * 255).resize(
            (sh, sh), Image.NEAREST)) > 127
        y0 = int(rng.integers(2 * h // 3, h - sh)) if h - sh > 2 * h // 3 else h - sh
        x0 = int(rng.integers(0, w - sh))
        color_px = np.array([rng.integers(160, 255), rng.integers(0, 80),
                             rng.integers(120, 255)], np.uint8)
        img[y0:y0 + sh, x0:x0 + sh][mm] = color_px
        ood = np.zeros((h, w), np.uint8)
        ood[y0:y0 + sh, x0:x0 + sh][mm] = 1
        Image.fromarray(img).save(track / "images" / f"val{i}.jpg")
        Image.fromarray(ood).save(track / "labels_masks"
                                  / f"val{i}_labels_semantic.png")
    return track


def compose_cleanbg_diffanom_track(work: Path, val_gen_root: Path,
                                   val_city: Path, val_stems):
    """The symmetric attribution track: CLEAN-rendered backgrounds with the
    DIFFUSION-TEXTURED anomaly pixels cut from the accepted generated val
    composites (same stem, same geometry). Detecting these but not the solid
    pastes = the 254-supervision generalizes over backgrounds but is bound to
    the diffusion's anomaly appearance family."""
    track = work / "val_cleanbg_diffanom"
    (track / "images").mkdir(parents=True, exist_ok=True)
    (track / "labels_masks").mkdir(parents=True, exist_ok=True)
    n = 0
    for stem in val_stems:
        gen_img_p = (val_gen_root / "leftImg8bit" / "train" / "synth"
                     / f"{stem}_leftImg8bit.png")
        gen_lbl_p = (val_gen_root / "gtFine" / "train" / "synth"
                     / f"{stem}_gtFine_labelTrainIds.png")
        if not gen_img_p.exists():
            continue
        ood = (np.asarray(Image.open(gen_lbl_p)) == 254)
        if not ood.any():
            continue
        clean = np.asarray(Image.open(
            val_city / "leftImg8bit" / "train" / "synth"
            / f"{stem}_leftImg8bit.png").convert("RGB")).copy()
        gen = np.asarray(Image.open(gen_img_p).convert("RGB"))
        clean[ood] = gen[ood]
        Image.fromarray(clean).save(track / "images" / f"val{n}.jpg")
        Image.fromarray(ood.astype(np.uint8)).save(
            track / "labels_masks" / f"val{n}_labels_semantic.png")
        n += 1
    return track, n


def gen_to_val_track(gen_root: Path, city: Path, track: Path, stems):
    """Reshape CG-Aug generation output into the RoadAnomaly21 val layout
    (image + binary OOD mask from the 254 pixels)."""
    (track / "images").mkdir(parents=True, exist_ok=True)
    (track / "labels_masks").mkdir(parents=True, exist_ok=True)
    n = 0
    for stem in stems:
        img_p = gen_root / "leftImg8bit" / "train" / "synth" / f"{stem}_leftImg8bit.png"
        lbl_p = gen_root / "gtFine" / "train" / "synth" / f"{stem}_gtFine_labelTrainIds.png"
        if not img_p.exists():
            continue
        tid = np.asarray(Image.open(lbl_p))
        ood = (tid == 254).astype(np.uint8)
        if ood.sum() == 0:
            continue
        # RoadAnomaly21 globs .jpg (reference layout) — re-encode at high quality
        with Image.open(img_p) as im:
            im.convert("RGB").save(track / "images" / f"val{n}.jpg", quality=95)
        Image.fromarray(ood).save(track / "labels_masks"
                                  / f"val{n}_labels_semantic.png")
        n += 1
    return n


def make_clean_arm(city: Path, out: Path, stems):
    """Control generation_root: the generated half is the clean image itself
    (DiverseCityscapes pairs by 'city_frame*' stem glob, so append a suffix)."""
    img_dir = out / "leftImg8bit" / "train" / "synth"
    lbl_dir = out / "gtFine" / "train" / "synth"
    img_dir.mkdir(parents=True, exist_ok=True)
    lbl_dir.mkdir(parents=True, exist_ok=True)
    for stem in stems:
        shutil.copy(
            city / "leftImg8bit" / "train" / "synth" / f"{stem}_leftImg8bit.png",
            img_dir / f"{stem}_c_leftImg8bit.png")
        shutil.copy(
            city / "gtFine" / "train" / "synth" / f"{stem}_gtFine_labelTrainIds.png",
            lbl_dir / f"{stem}_c_gtFine_labelTrainIds.png")


def train_arm(arm: str, seed: int, city: Path, gen_root: Path, track: Path,
              work: Path, epochs: int, crop: int):
    """One REAL TrainDeepLabOOD run; returns best val metrics + curves."""
    import os

    from multishiftseg_tpu.core.config import load_config
    from multishiftseg_tpu.models.deeplab import DeepWV3Plus
    from multishiftseg_tpu.train.deeplab_trainer import TrainDeepLabOOD

    run_dir = work / f"run_{arm}_s{seed}"
    run_dir.mkdir(exist_ok=True)
    cwd = os.getcwd()
    os.chdir(run_dir)
    try:
        cfg = load_config(str(REPO / "exps" / "deeplab.yaml"),
                          exp_id=f"abl_{arm}_s{seed}")
        cfg.data.cityscapes_root = str(city)
        cfg.data.generation_root = str(gen_root)
        cfg.data.anomaly_track_root = str(track)
        cfg.data.coco_root = str(work / "no_coco")
        cfg.data.crop_size = (crop, crop)
        cfg.data.num_workers = 4
        cfg.train.n_epochs = epochs
        cfg.train.warmup_epoch = max(epochs // 2, 1)
        cfg.train.train_batch = 4
        cfg.train.lr = 1e-3
        cfg.train.seed = seed
        cfg.train.bf16 = False
        cfg.loss.params["num_pair_samples"] = 512

        trainer = TrainDeepLabOOD(cfg, model=DeepWV3Plus(num_classes=19,
                                                         **TINY_TRUNK))
        best = trainer.train()
        return {"best_auprc": round(float(best["AUPRC"]), 4),
                "model_dir": str(run_dir / cfg.model_dir),
                "variables": trainer.variables}
    finally:
        os.chdir(cwd)


def eval_variables(variables, track: Path):
    """Exact AUROC/AUPRC/FPR95 of a trained model on one val track."""
    import jax
    import jax.numpy as jnp

    from multishiftseg_tpu.data.anomaly import RoadAnomaly21
    from multishiftseg_tpu.data.loader import pad_to_multiple
    from multishiftseg_tpu.data.transforms import Compose, Normalize, ToTensor
    from multishiftseg_tpu.evals.ood_metrics import eval_ood_measure
    from multishiftseg_tpu.models.deeplab import DeepWV3Plus

    model = DeepWV3Plus(num_classes=19, **TINY_TRUNK)

    @jax.jit
    def fwd(img):
        score, _ = model.apply(variables, img, train=False)
        return score

    tf = Compose([ToTensor(), Normalize(mean=(0.485, 0.456, 0.406),
                                        std=(0.229, 0.224, 0.225))])
    ds = RoadAnomaly21(root=str(track), transform=tf)
    scores, gts = [], []
    for i in range(len(ds)):
        img, tgt = ds[i][:2]
        x, (h, w) = pad_to_multiple(np.asarray(img), 32)
        a = np.asarray(fwd(jnp.asarray(x[None])))[0, :h, :w]
        scores.append(a.reshape(-1))
        gts.append(np.asarray(tgt).reshape(-1))
    res = eval_ood_measure(np.concatenate(scores), np.concatenate(gts))
    return {"AUROC": round(res[0], 4), "AUPRC": round(res[1], 4),
            "FPR_TPR95": round(res[2], 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/cgaug_ablation")
    ap.add_argument("--backend_steps", type=int, default=1500)
    ap.add_argument("--n_world", type=int, default=32,
                    help="clean training scenes (pairs)")
    ap.add_argument("--n_val_gen", type=int, default=8)
    ap.add_argument("--n_val_transfer", type=int, default=8)
    ap.add_argument("--hw", type=int, nargs=2, default=(96, 192))
    ap.add_argument("--crop", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--seeds", type=int, nargs="*", default=[0, 1])
    ap.add_argument("--diverse_paste", type=float, default=0.0,
                    help="fraction of the diffusion paste bank rendered in "
                         "RANDOM colors (appearance diversity for the "
                         "transfer val; see build_paste_bank)")
    ap.add_argument("--domain_randomize", action="store_true",
                    help="per-scene appearance randomization for the world "
                         "AND the (held-out) transfer val — the domain "
                         "bridge that makes appearance transfer measurable "
                         "(see cgaug_quality_eval.synth_scene)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import logging

    logging.basicConfig(level=logging.WARNING, stream=sys.stderr)
    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    h, w = args.hw
    t0 = time.time()

    from multishiftseg_tpu.cgaug import train_backends as TB
    from multishiftseg_tpu.cgaug.diffusion import JaxSegDiffusion
    from multishiftseg_tpu.cgaug.generate import (GenerationConfig,
                                                  MultiShiftGenerator)
    from multishiftseg_tpu.cgaug.segmenter import JaxPromptableSegmenter

    # 1. world ---------------------------------------------------------------
    city = build_world(work, args.n_world, h, w,
                       domain_randomize=args.domain_randomize)
    print(f"[{time.time()-t0:.0f}s] world: {args.n_world} scenes"
          + (" (domain-randomized)" if args.domain_randomize else ""),
          file=sys.stderr)

    # 2. backends (ADE-palette conditioning + anomaly-paste augmentation —
    # the round-4 recipe that lifted the SAM-IoU pass rate past the 0.632
    # plateau, see cgaug_quality_eval.build_paste_bank) ------------------------
    diff_params, _ = TB.train_diffusion(
        str(city), str(work / "ckpt"), steps=args.backend_steps, batch=8,
        image_hw=(h, w), base=32, save_every=0, log_every=500,
        paste_bank=build_paste_bank(diverse_frac=args.diverse_paste))
    mask_dir = work / "masks"
    mask_dir.mkdir(exist_ok=True)
    src = ShapeSource()
    mrng = np.random.default_rng(7)
    for i in range(24):
        m, _ = src.sample(mrng)
        Image.fromarray((m * 255).astype(np.uint8)).save(mask_dir / f"m{i}.png")
    seg_params, _ = TB.train_segmenter(
        str(work / "ckpt_seg"), mask_dir=str(mask_dir),
        steps=max(400, args.backend_steps), batch=8, size=96, base=32,
        log_every=500)
    print(f"[{time.time()-t0:.0f}s] backends trained", file=sys.stderr)

    diffusion = JaxSegDiffusion((h, w), params=diff_params, base=32, steps=12,
                                seed=0)
    segmenter = JaxPromptableSegmenter(params=seg_params, base=32)

    # 3. CG-Aug generation: train-set + held-out generation-val ---------------
    stems = [f"synth_{i:06d}_000019" for i in range(args.n_world)]
    gen = MultiShiftGenerator(
        diffusion=diffusion, anomaly_source=src, segmenter=segmenter,
        detector=None, cfg=GenerationConfig(iou_threshold=0.7, max_retries=4,
                                            seed=0, paste_min_size=h // 5,
                                            paste_max_size=h // 2))
    gen_root = work / "generated"
    colors = [str(city / "gtFine" / "train" / "synth" / f"{s}_gtFine_color.png")
              for s in stems]
    tids = [c.replace("_gtFine_color", "_gtFine_labelTrainIds") for c in colors]
    gen.run(colors, tids,
            str(gen_root / "leftImg8bit" / "train" / "synth"),
            str(gen_root / "gtFine" / "train" / "synth"))
    train_stats = dict(gen.stats)
    print(f"[{time.time()-t0:.0f}s] train-set generation: {train_stats}",
          file=sys.stderr)

    # held-out generation-val: FRESH layouts through the same pipeline
    val_city = build_world(work / "valworld", args.n_val_gen + args.n_world,
                           h, w, domain_randomize=args.domain_randomize)
    val_stems = [f"synth_{i:06d}_000019"
                 for i in range(args.n_world, args.n_world + args.n_val_gen)]
    val_gen_root = work / "val_generated"
    gen2 = MultiShiftGenerator(
        diffusion=diffusion, anomaly_source=src, segmenter=segmenter,
        detector=None, cfg=GenerationConfig(iou_threshold=0.7, max_retries=4,
                                            seed=99, paste_min_size=h // 5,
                                            paste_max_size=h // 2))
    gen2.run([str(val_city / "gtFine" / "train" / "synth" / f"{s}_gtFine_color.png")
              for s in val_stems],
             [str(val_city / "gtFine" / "train" / "synth"
                  / f"{s}_gtFine_labelTrainIds.png") for s in val_stems],
             str(val_gen_root / "leftImg8bit" / "train" / "synth"),
             str(val_gen_root / "gtFine" / "train" / "synth"))
    track_gen = work / "val_gen_track"
    n_gen_val = gen_to_val_track(val_gen_root, val_city, track_gen, val_stems)
    track_transfer = render_transfer_val(
        work, args.n_val_transfer, h, w,
        domain_randomize=args.domain_randomize)
    track_diffbg = render_transfer_diffbg(work, diffusion, val_city,
                                          val_stems, h, w)
    track_cbda, n_cbda = compose_cleanbg_diffanom_track(
        work, val_gen_root, val_city, val_stems)
    print(f"[{time.time()-t0:.0f}s] val tracks: gen={n_gen_val} "
          f"transfer={args.n_val_transfer} diffbg={len(val_stems)} "
          f"cleanbg_diffanom={n_cbda}", file=sys.stderr)

    # 4. control arm data ------------------------------------------------------
    clean_root = work / "clean_arm"
    make_clean_arm(city, clean_root, stems)

    # 5. train both arms x seeds; 6. evaluate ---------------------------------
    arms = {"cgaug": gen_root, "clean": clean_root}
    results = {a: [] for a in arms}
    for seed in args.seeds:
        for arm, root in arms.items():
            r = train_arm(arm, seed, city, root, track_gen, work,
                          args.epochs, args.crop)
            variables = r.pop("variables")
            r["seed"] = seed
            r["val_generation"] = eval_variables(variables, track_gen)
            r["val_transfer"] = eval_variables(variables, track_transfer)
            r["val_transfer_diffbg"] = eval_variables(variables, track_diffbg)
            if n_cbda:
                r["val_cleanbg_diffanom"] = eval_variables(variables,
                                                           track_cbda)
            results[arm].append(r)
            print(f"[{time.time()-t0:.0f}s] arm={arm} seed={seed}: "
                  f"gen={r['val_generation']} transfer={r['val_transfer']} "
                  f"diffbg={r['val_transfer_diffbg']} "
                  f"cbda={r.get('val_cleanbg_diffanom')}", file=sys.stderr)

    def mean(arm, key):
        vals = [r[key]["AUPRC"] for r in results[arm] if key in r]
        return round(float(np.mean(vals)), 4) if vals else None

    out = {
        "protocol": "paired CG-Aug generated half vs clean-copy half, "
                    "real TrainDeepLabOOD two-stage RCL recipe",
        "train_generation_stats": train_stats,
        "domain_randomize": bool(args.domain_randomize),
        "diverse_paste": args.diverse_paste,
        "seeds": args.seeds,
        "arms": results,
        "mean_auprc": {
            "cgaug": {"generation_val": mean("cgaug", "val_generation"),
                      "transfer_val": mean("cgaug", "val_transfer"),
                      "transfer_diffbg": mean("cgaug", "val_transfer_diffbg"),
                      "cleanbg_diffanom": mean("cgaug",
                                               "val_cleanbg_diffanom")},
            "clean": {"generation_val": mean("clean", "val_generation"),
                      "transfer_val": mean("clean", "val_transfer"),
                      "transfer_diffbg": mean("clean", "val_transfer_diffbg"),
                      "cleanbg_diffanom": mean("clean",
                                               "val_cleanbg_diffanom")},
        },
    }
    out["gap"] = {
        "generation_val": round(out["mean_auprc"]["cgaug"]["generation_val"]
                                - out["mean_auprc"]["clean"]["generation_val"], 4),
        "transfer_val": round(out["mean_auprc"]["cgaug"]["transfer_val"]
                              - out["mean_auprc"]["clean"]["transfer_val"], 4),
        "transfer_diffbg": round(
            out["mean_auprc"]["cgaug"]["transfer_diffbg"]
            - out["mean_auprc"]["clean"]["transfer_diffbg"], 4),
    }
    out["improved"] = bool(out["gap"]["generation_val"] > 0.05)
    out["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return 0 if out["improved"] else 1


if __name__ == "__main__":
    sys.exit(main())
