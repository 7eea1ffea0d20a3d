"""Pipeline-architecture diagram + summary slide deck.

Reporting-script parity with the reference's
scripts/generate_reporting_assets.py:37-190 — a matplotlib-drawn diagram of
the five-stage TPU-native pipeline (PNG) and a two-page PDF summary.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib.backends.backend_pdf import PdfPages
from matplotlib.patches import FancyArrowPatch, FancyBboxPatch

STAGES = [
    ("Data audit", "inventory, metadata,\nhistograms, report"),
    ("Feature extraction", "Pallas preproc +\nfrozen ResNet-18 (bf16)\n512-D embeddings"),
    ("Standardize +\nclustering", "z-score, PCA, t-SNE,\nUMAP, K-Means, DBSCAN"),
    ("Training", "supervised baseline +\npseudo-label → pretrain\n→ finetune (jit, mesh)"),
    ("Calibration", "recall-first threshold,\nsweeps, triage CSV"),
]


def _box(ax, x, y, w, h, title, body):
    ax.add_patch(
        FancyBboxPatch(
            (x, y), w, h, boxstyle="round,pad=0.02",
            facecolor="#e8f0fe", edgecolor="#1a56a8", linewidth=1.5,
        )
    )
    ax.text(x + w / 2, y + h * 0.72, title, ha="center", va="center",
            fontsize=11, fontweight="bold", color="#1a3a6b")
    ax.text(x + w / 2, y + h * 0.32, body, ha="center", va="center",
            fontsize=8, color="#333333")


def create_pipeline_diagram(output_path: Path) -> None:
    fig, ax = plt.subplots(figsize=(14, 3.2))
    ax.set_xlim(0, 14)
    ax.set_ylim(0, 3)
    ax.axis("off")
    w, h, gap = 2.4, 1.6, 0.35
    x = 0.2
    for i, (title, body) in enumerate(STAGES):
        _box(ax, x, 0.7, w, h, title, body)
        if i < len(STAGES) - 1:
            ax.add_patch(
                FancyArrowPatch(
                    (x + w, 1.5), (x + w + gap, 1.5),
                    arrowstyle="-|>", mutation_scale=18, color="#1a56a8",
                )
            )
        x += w + gap
    ax.text(7, 2.75, "TPU-native semi-supervised MRI screening pipeline",
            ha="center", fontsize=13, fontweight="bold")
    ax.text(7, 0.25,
            "stages exchange artifacts under outputs/ · compute path: JAX/XLA/Pallas over a (data, model) mesh",
            ha="center", fontsize=9, color="#555555")
    output_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(output_path, dpi=200, bbox_inches="tight")
    plt.close(fig)


def create_summary_slides(output_path: Path) -> None:
    output_path.parent.mkdir(parents=True, exist_ok=True)
    with PdfPages(output_path) as pdf:
        fig, ax = plt.subplots(figsize=(11, 8.5))
        ax.axis("off")
        ax.text(0.5, 0.8, "Semi-supervised brain-MRI screening",
                ha="center", fontsize=24, fontweight="bold")
        ax.text(0.5, 0.68, "TPU-native rebuild — JAX / XLA / Pallas / pjit",
                ha="center", fontsize=16, color="#1a56a8")
        ax.text(
            0.5, 0.40,
            "• frozen ResNet-18 512-D embeddings (fused device preprocessing)\n"
            "• PCA / t-SNE / UMAP + K-Means / DBSCAN cohort analysis\n"
            "• pseudo-label → weak-pretrain → fine-tune training\n"
            "• recall-first threshold calibration and triage",
            ha="center", fontsize=13,
        )
        pdf.savefig(fig)
        plt.close(fig)

        fig, ax = plt.subplots(figsize=(11, 8.5))
        ax.axis("off")
        ax.text(0.5, 0.9, "Architecture", ha="center", fontsize=20,
                fontweight="bold")
        ax.text(
            0.5, 0.45,
            "Host: native libjpeg decode → decode-once uint8 store →\n"
            "double-buffered host→HBM feed\n\n"
            "Device: Pallas resize/normalize kernel → ResNet-18 (bf16, MXU)\n"
            "→ jit train/eval steps sharded over a (data, model) mesh\n\n"
            "Artifacts: reference-compatible outputs/ contract\n"
            "(embeddings, tables, figures, notes, torch-loadable checkpoints)",
            ha="center", fontsize=13,
        )
        pdf.savefig(fig)
        plt.close(fig)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output-dir", type=Path, default=Path("outputs"))
    args = parser.parse_args(argv)
    create_pipeline_diagram(args.output_dir / "figures" / "pipeline_architecture.png")
    create_summary_slides(args.output_dir / "notes" / "summary_slides.pdf")
    print("Wrote pipeline diagram + summary slides")


if __name__ == "__main__":
    main()
