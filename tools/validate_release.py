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
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

# README.md:143-144 — RoadAnomaly rows (AUROC / AUPRC / FPR@95, percent)
PUBLISHED = {
    "deeplab": {"AUROC": 96.40, "AUPRC": 74.60, "FPR_TPR95": 16.08},
    "m2f": {"AUROC": 97.94, "AUPRC": 90.17, "FPR_TPR95": 7.54},
}


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
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
