"""Model-comparison figure from ``results_comparison_detailed.csv``.

Reporting-script parity with the reference's
scripts/generate_model_comparison.py:40-180 — grouped bars of
accuracy / precision / recall / F1 / FPR across the four model variants,
plus a caption text file noting the operating point.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

ORDERED_VARIANTS = [
    "baseline_argmax",
    "baseline_thresholded",
    "semi_argmax",
    "semi_thresholded",
]
DISPLAY = {
    "baseline_argmax": "Baseline\n(argmax)",
    "baseline_thresholded": "Baseline\n(thresholded)",
    "semi_argmax": "Semi\n(argmax)",
    "semi_thresholded": "Semi\n(thresholded)",
}
METRICS = ["accuracy", "precision", "recall", "f1", "FPR"]


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output-dir", type=Path, default=Path("outputs"))
    args = parser.parse_args(argv)

    results_csv = args.output_dir / "tables" / "results_comparison_detailed.csv"
    if not results_csv.exists():
        raise SystemExit(f"Missing results CSV: {results_csv}")
    df = pd.read_csv(results_csv, index_col=0)
    df = df.loc[[v for v in ORDERED_VARIANTS if v in df.index]]

    if "f1" not in df.columns and {"precision", "recall"}.issubset(df.columns):
        p, r = df["precision"].astype(float), df["recall"].astype(float)
        df["f1"] = np.where((p + r) > 0, 2 * p * r / (p + r), 0.0)

    variants = list(df.index)
    x = np.arange(len(variants))
    width = 0.15
    fig, ax = plt.subplots(figsize=(10, 5))
    for i, metric in enumerate(METRICS):
        if metric not in df.columns:
            continue
        ax.bar(x + i * width, df[metric].astype(float), width=width, label=metric)
    ax.set_xticks(x + (len(METRICS) - 1) * width / 2)
    ax.set_xticklabels([DISPLAY.get(v, v) for v in variants])
    ax.set_ylabel("Score")
    ax.set_ylim(0, 1.05)
    ax.set_title("Model comparison — baseline vs semi-supervised")
    ax.legend()
    ax.grid(axis="y", alpha=0.3)
    fig.tight_layout()
    out_png = args.output_dir / "figures" / "model_comparison.png"
    out_png.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_png, dpi=200)
    plt.close(fig)

    caption = ["Model comparison across evaluation variants."]
    op_path = args.output_dir / "notes" / "operating_point.json"
    if op_path.exists():
        op = json.loads(op_path.read_text())
        caption.append(
            f"Semi-supervised operating point: threshold={op.get('threshold')}, "
            f"policy={op.get('policy')}, target_recall={op.get('target_recall')}, "
            f"min_precision={op.get('min_precision')}."
        )
    (args.output_dir / "figures" / "model_comparison_caption.txt").write_text(
        "\n".join(caption) + "\n"
    )
    print(f"Wrote {out_png}")


if __name__ == "__main__":
    main()
