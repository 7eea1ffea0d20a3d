"""Generate the committed repo-root ``notes/`` run reports from a completed
full-workflow run (round-4 verdict task 4).

The reference commits its run story as ``notes/training_report.md`` and
``notes/clustering_metrics.md`` (reference notes/training_report.md:29-32,
notes/clustering_metrics.md:3-9) alongside the gitignored ``outputs/``
tree. This script reads the artifacts the workflow just wrote (the
ArtifactRegistry contract) plus the stage wall-clocks from the workflow
log and emits the TPU rebuild's counterparts.

Usage:
  python scripts/generate_run_notes.py [--log /tmp/workflow.log]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def stage_times(log: Path) -> dict:
    if not log or not log.exists():
        return {}
    out = {}
    for m in re.finditer(r"=== (\w+) done in ([\d.]+)s", log.read_text()):
        out[m.group(1)] = float(m.group(2))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", type=Path, default=None,
                    help="workflow stdout/stderr log (stage wall-clocks)")
    ap.add_argument("--outputs", type=Path, default=REPO / "outputs")
    ap.add_argument("--notes", type=Path, default=REPO / "notes")
    args = ap.parse_args()

    import pandas as pd

    o = args.outputs
    times = stage_times(args.log) if args.log else {}

    comp = pd.read_csv(o / "tables" / "results_comparison.csv", index_col=0)
    det_path = o / "tables" / "results_comparison_detailed.csv"
    if det_path.exists():
        # argmax rows live only in the detailed table (confusion-matrix
        # schema, no f1 column — derive it from precision/recall)
        det = pd.read_csv(det_path, index_col=0)
        for name in det.index.difference(comp.index):
            r = det.loc[name]
            p, rc = float(r["precision"]), float(r["recall"])
            comp.loc[name] = {
                "accuracy": r["accuracy"], "precision": p, "recall": rc,
                "f1": 2 * p * rc / max(p + rc, 1e-12),
                "threshold": r.get("threshold"),
                "training_time_sec": r["training_time_sec"],
            }
    hist = json.loads((o / "notes" / "training_history.json").read_text())
    op = json.loads((o / "notes" / "operating_point.json").read_text())
    feature_md = (o / "notes" / "feature_summary.md").read_text()
    backbone = next(
        (ln.split(": ", 1)[1] for ln in feature_md.splitlines()
         if ln.startswith("- Backbone:")), "?",
    )

    args.notes.mkdir(exist_ok=True)

    # ---- training_report.md ---------------------------------------------
    rows = []
    for name, label in (
        ("baseline_argmax", "Baseline (argmax)"),
        ("baseline_thresholded", "Baseline (thresholded)"),
        ("semi_argmax", "Semi-supervised (argmax)"),
        ("semi_thresholded", "Semi-supervised (thresholded)"),
    ):
        if name in comp.index:
            r = comp.loc[name]
            thr = "" if pd.isna(r.get("threshold")) else f"{r['threshold']:.3f}"
            rows.append(
                f"| {label} | {r['accuracy']:.3f} | {r['precision']:.3f} "
                f"| {r['recall']:.3f} | {r['f1']:.3f} "
                f"| {r['training_time_sec']:.1f} | {thr} |"
            )

    stage_rows = "\n".join(
        f"| {name} | {sec:.1f} |" for name, sec in times.items()
    )
    report = f"""# Semi-supervised vs supervised training report (TPU rebuild run)

Full 5-stage workflow executed on a **TPU v5e (1 chip)** via
`scripts/run_full_workflow.sh` against the real 1506-image corpus
(100 labeled, 1406 unlabeled, 512x512 JPEG). Counterpart of the
reference's committed `notes/training_report.md` (reference
notes/training_report.md:29-32).

**Honest caveat — seeded init.** This environment has no egress and no
pretrained checkpoint, so the backbone is `{backbone}`. The reference's
committed numbers ride IMAGENET1K_V1 features; absolute metrics here are
therefore NOT comparable to the reference's 0.90/0.947 F1 (BASELINE.md).
Drop a torchvision `resnet18_imagenet1k.pt` at
`outputs/models/resnet18_imagenet1k.pt` (or set `SSIP_RESNET18_WEIGHTS`)
and re-run to reproduce the pretrained regime — the port path is
torch-oracle tested to 1e-4 (tests/test_weights_cli.py).

## Configuration (reference parity)
* Arch {hist.get('arch', 'resnet18')}, image size {hist.get('image_size', 224)},
  AdamW lr 1e-4 wd 1e-4, ReduceLROnPlateau(patience=2, rel 1e-4),
  early stop patience 3 (best-state restore), batch 16.
* Semi-supervised: baseline -> pseudo-label weak pool @ conf >= 0.70
  (cohort-filtered by DBSCAN non-noise) -> fc-frozen pretrain ->
  unfrozen fine-tune at lr/2.
* Threshold policy: target-recall 0.98, min-precision 0.60 (constrained).

## Results (this run)

| Model | Accuracy | Precision | Recall | F1 | Train s | Threshold |
|---|---|---|---|---|---|---|
{chr(10).join(rows)}

Operating point (deployed): threshold {op.get('threshold', float('nan')):.4f},
policy `{op.get('policy', '?')}` -> `outputs/notes/operating_point.json`;
triage CSV `outputs/tables/unlabeled_predictions_semi.csv`.

## Stage wall-clocks (single TPU v5e chip + 1 host core)

| Stage | seconds |
|---|---|
{stage_rows}

Wall-clock notes: each stage is a separate process paying its own JAX
session init + compile over the tunneled chip; the steady-state on-chip
rates are the headline numbers in `outputs/notes/benchmarks.md` (32.9k
imgs/s embed). Artifact inventory: `outputs/README.md`.
"""
    (args.notes / "training_report.md").write_text(report)

    # ---- clustering_metrics.md ------------------------------------------
    mc = pd.read_csv(o / "tables" / "metrics_clustering.csv")
    km = mc[mc.method == "kmeans"]
    best_km = km.loc[km.ARI.idxmax()] if len(km) else None
    db = mc[mc.method == "dbscan"]
    best_db = db.loc[db.silhouette.idxmax()] if len(db) else None
    creport = (o / "notes" / "clustering_report.md").read_text()
    std_lines = [
        ln for ln in creport.splitlines()
        if ln.startswith("- labeled:") or ln.startswith("- unlabeled:")
    ]

    def fmt_row(r):
        p = json.loads(r.params_json)
        return (
            f"params {p}: ARI {r.ARI:.4f}, NMI {r.NMI:.4f}, "
            f"silhouette {r.silhouette:.4f}, noise {r.noise_rate:.4f}"
        )

    cm = f"""# Clustering metrics snapshot (TPU rebuild run)

Computed by `python -m src.clustering --dbscan-auto --dbscan-scope
unlabeled` from `outputs/features/standardized_features.npz` (seeded-init
embeddings — see notes/training_report.md for the caveat); counterpart of
the reference's `notes/clustering_metrics.md`. All metrics from the
from-scratch jnp implementations (ssip_tpu/analysis/), sklearn-oracle
tested (tests/test_analysis.py).

- Standardization summary (mean |mu| / mean sigma):
{chr(10).join('  ' + ln for ln in std_lines)}
- K-Means sweep (k=2-10, PCA space): best {fmt_row(best_km) if best_km is not None else 'n/a'}
- DBSCAN (scope=unlabeled, auto-eps via k-distance 98th pct): best {fmt_row(best_db) if best_db is not None else 'n/a'}
- Full sweep table: `outputs/tables/metrics_clustering.csv`;
  k-distance diagnostics: `outputs/figures/kdist_plot_unlabeled*.png`.
- ARI/NMI are labeled-subset-only; silhouette on the fitted space
  (same conventions as the reference).
"""
    (args.notes / "clustering_metrics.md").write_text(cm)
    print(f"wrote {args.notes / 'training_report.md'}")
    print(f"wrote {args.notes / 'clustering_metrics.md'}")


if __name__ == "__main__":
    main()
