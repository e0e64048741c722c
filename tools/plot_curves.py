"""Plot training curves from a run's scalars.csv.

The reference creates a tensorboardX writer and a ``plot_curves_multi`` helper
(``train_deeplab.py:175,264-279``) that it barely feeds; here every trainer
persists per-epoch scalars to ``ckpts/<id>/scalars.csv`` and this tool renders
them (matplotlib if available, else an ASCII fallback — the environment has no
display server).

Usage: python tools/plot_curves.py ckpts/<id> [--tags val/AUPRC train/loss]
                                   [--out curves.png]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def ascii_plot(series, width=64, height=12):
    """Minimal ASCII chart: one line per tag, values scaled to the column."""
    lines = []
    for tag, pts in series.items():
        ys = [v for _, v in pts]
        lo, hi = min(ys), max(ys)
        span = (hi - lo) or 1.0
        cells = [" "] * width
        for i, y in enumerate(ys):
            x = int(i * (width - 1) / max(len(ys) - 1, 1))
            lvl = int((y - lo) / span * 9)
            cells[x] = str(lvl)
        lines.append(f"{tag:>24} |{''.join(cells)}| [{lo:.4g}, {hi:.4g}]")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", help="directory containing scalars.csv")
    ap.add_argument("--tags", nargs="*", default=None,
                    help="tags to plot (default: all)")
    ap.add_argument("--out", default=None, help="write a PNG here (matplotlib)")
    args = ap.parse_args()

    from multishiftseg_tpu.core.logging import ScalarWriter

    w = ScalarWriter(args.run_dir)
    curves = w.read()
    w.close()
    if args.tags:
        curves = {t: curves[t] for t in args.tags if t in curves}
    if not curves:
        print("no matching scalars", file=sys.stderr)
        return 1

    if args.out:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(len(curves), 1, figsize=(8, 2.2 * len(curves)),
                                 squeeze=False)
        for ax, (tag, pts) in zip(axes[:, 0], sorted(curves.items())):
            ax.plot([s for s, _ in pts], [v for _, v in pts], marker=".")
            ax.set_ylabel(tag)
            ax.grid(True, alpha=0.3)
        axes[-1, 0].set_xlabel("epoch")
        fig.tight_layout()
        fig.savefig(args.out, dpi=120)
        print(f"wrote {args.out}")
    else:
        print(ascii_plot(curves))
    return 0


if __name__ == "__main__":
    sys.exit(main())
