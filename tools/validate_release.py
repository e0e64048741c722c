"""One-command released-checkpoint accuracy validation against the README table.

The reference defines local correctness as: run RoadAnomaly inference with the
released checkpoint and match the published numbers (``README.md:140-146``).
This script is that check for the TPU framework — the moment the weights and
the RoadAnomaly dataset are obtainable (this build environment has no egress),
it downloads/converts/evaluates and asserts every metric within the driver's
±0.5-pt budget (BASELINE.md):

    python tools/validate_release.py --model deeplab \
        [--weight_path DeepLab_best.pth] [--road_anomaly_root datasets/road_anomaly]

Weights auto-fetch from the Hugging Face mirrors registered in
``cgaug/weights.py`` (``deeplab_best`` / ``m2f_best``) when ``--weight_path``
is omitted. Exit code 0 = all metrics within tolerance.

For m2f, a passing exact-path validation automatically RE-QUALIFIES the
approximate deformable-sampling fast paths (nearest / shared / int8) on these
weights: each mode is evaluated on the same dataset and its AUROC/AUPRC/FPR95
deltas vs the measured exact-bilinear result are gated at the same ±0.5-pt
budget. The verdict is written next to the checkpoint
(``<stem>.sampling_qualification.json``) and enforced by
``test_runner.build_m2f_forward`` — a refused mode cannot be constructed for
these weights until re-qualified. Exit code 3 = exact path PASSED but at
least one fast path was REFUSED.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

# README.md:143-144 — RoadAnomaly rows (AUROC / AUPRC / FPR@95, percent)
PUBLISHED = {
    "deeplab": {"AUROC": 96.40, "AUPRC": 74.60, "FPR_TPR95": 16.08},
    "m2f": {"AUROC": 97.94, "AUPRC": 90.17, "FPR_TPR95": 7.54},
}

# the approximate eval fast paths to (re-)measure per checkpoint (PERF.md;
# test_runner --sample_mode / --score_lowres / --score_topq; a '+lowres'
# suffix scores the anomaly branch at mask resolution, '+topq{Q}' upsamples
# only the Q largest-mass OOD queries — see models.maskformer.inference)
QUAL_MODES = ("nearest", "shared", "int8", "nearest_top6c",
              "nearest+lowres", "nearest+topq32")


def qualify_sampling_modes(cfg, weight_path, dataset_name, dataset_root,
                           bilinear_pts, tolerance, tta=False,
                           modes=QUAL_MODES):
    """Measure every approximate sampling mode on the SAME weights + dataset
    and gate each at ±``tolerance`` percentage points vs the exact bilinear
    result (``bilinear_pts``: {"AUROC": pts, ...}).

    Returns the qualification record (also consumed by
    ``test_runner.check_sampling_qualification``). Builds forwards via the
    module attribute ``test_runner.build_m2f_forward`` with
    ``enforce_qualification=False`` so a previously-refused mode can be
    re-measured."""
    from multishiftseg_tpu.train import test_runner

    out = {"dataset": dataset_name, "tolerance_pts": tolerance,
           "bilinear_pts": {k: round(v, 4) for k, v in bilinear_pts.items()},
           "modes": {}}
    for mode in modes:
        base, _, suffix = mode.partition("+")
        fwd = test_runner.build_m2f_forward(
            cfg, weight_path, sample_mode=base, enforce_qualification=False,
            score_lowres=(suffix == "lowres"),
            score_topq=(int(suffix[4:]) if suffix.startswith("topq") else 0))
        ev = test_runner.OODEvaluator(cfg, fwd, {dataset_name: dataset_root},
                                      tta=tta)
        got = ev.test_all((dataset_name,)).get(dataset_name)
        rec = {"qualified": False, "error": "evaluation produced no result"}
        if got:
            vals = {k: 100.0 * float(got[k]) for k in bilinear_pts}
            deltas = {k: round(vals[k] - bilinear_pts[k], 4) for k in vals}
            rec = {"metrics_pts": {k: round(v, 4) for k, v in vals.items()},
                   "delta_pts": deltas,
                   "qualified": all(abs(d) <= tolerance
                                    for d in deltas.values())}
        out["modes"][mode] = rec
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["deeplab", "m2f"], required=True)
    ap.add_argument("--cfg", default=None,
                    help="experiment yaml (defaults to exps/<model>.yaml)")
    ap.add_argument("--weight_path", default=None,
                    help="released checkpoint; auto-fetched when omitted")
    ap.add_argument("--road_anomaly_root", default=None)
    ap.add_argument("--tolerance", type=float, default=0.5,
                    help="max |delta| in percentage points (BASELINE.md budget)")
    ap.add_argument("--tta", action="store_true")
    ap.add_argument("--skip_sampling_qualification", action="store_true",
                    help="m2f: skip re-qualifying the approximate sampling "
                         "fast paths on these weights")
    args = ap.parse_args()

    import logging

    logging.basicConfig(level=logging.INFO)

    from multishiftseg_tpu.cgaug.weights import fetch_weight
    from multishiftseg_tpu.core.config import load_config
    from multishiftseg_tpu.train.test_runner import (OODEvaluator,
                                                     build_deeplab_forward,
                                                     build_m2f_forward)

    cfg_path = args.cfg or str(
        Path(__file__).parent.parent / "exps" / f"{args.model}.yaml")
    cfg = load_config(cfg_path, exp_id=f"validate_{args.model}")
    if args.road_anomaly_root:
        cfg.data.road_anomaly_root = args.road_anomaly_root

    weight_path = args.weight_path or fetch_weight(f"{args.model}_best")
    build = build_deeplab_forward if args.model == "deeplab" else build_m2f_forward
    fwd = build(cfg, weight_path)

    ev = OODEvaluator(cfg, fwd, {"RoadAnomaly": cfg.data.road_anomaly_root},
                      tta=args.tta)
    results = ev.test_all(("RoadAnomaly",))
    got = results.get("RoadAnomaly")
    if not got:
        print("FAIL: RoadAnomaly evaluation produced no result "
              "(dataset missing at --road_anomaly_root?)")
        return 2

    want = PUBLISHED[args.model]
    ok = True
    print(f"\n{args.model} RoadAnomaly vs README.md:143-144 "
          f"(tolerance ±{args.tolerance} pts):")
    for k, ref in want.items():
        val = 100.0 * float(got[k])
        delta = val - ref
        line_ok = abs(delta) <= args.tolerance
        ok &= line_ok
        print(f"  {k:10s} {val:7.2f}  published {ref:7.2f}  "
              f"delta {delta:+.2f}  {'OK' if line_ok else 'OUT OF BUDGET'}")
    print("PASS" if ok else "FAIL")
    if not ok:
        return 1

    if args.model == "m2f" and not args.skip_sampling_qualification:
        from multishiftseg_tpu.train.test_runner import (
            sampling_qualification_path)

        bilinear_pts = {k: 100.0 * float(got[k]) for k in want}
        qual = qualify_sampling_modes(
            cfg, weight_path, "RoadAnomaly", cfg.data.road_anomaly_root,
            bilinear_pts, args.tolerance, tta=args.tta)
        qp = sampling_qualification_path(weight_path)
        qp.write_text(json.dumps(qual, indent=1))
        refused = [m for m, r in qual["modes"].items() if not r["qualified"]]
        print(f"\nsampling fast-path qualification (±{args.tolerance} pts vs "
              f"measured bilinear; recorded at {qp}):")
        for m, r in qual["modes"].items():
            d = r.get("delta_pts", r.get("error"))
            print(f"  {m:10s} {'QUALIFIED' if r['qualified'] else 'REFUSED'}"
                  f"  {d}")
        if refused:
            print(f"FAST PATHS REFUSED: {refused} — test_runner will reject "
                  "--sample_mode for these weights until re-qualified")
            return 3
    return 0


if __name__ == "__main__":
    sys.exit(main())
