"""Generate ``outputs/README.md`` — the run-summary entry point.

The reference ships a run-summary README at the artifact root
(/root/reference/outputs/README.md:1-8): headline metrics, operating point,
threshold-sweep and clustering highlights, plus a map of the key artifacts.
This script rebuilds that summary from whatever artifacts the current run
produced — every section is optional, so it works after any prefix of the
workflow (scripts/run_full_workflow.sh runs it last).

Usage: ``python scripts/generate_outputs_readme.py [--output-dir outputs]``
"""

from __future__ import annotations

import argparse
import json
import sys
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ssip_tpu.runtime.artifacts import ArtifactRegistry


def _fmt(v, digits: int = 3) -> str:
    try:
        f = float(v)
        return f"{f:.{digits}f}" if f == f else "—"  # NaN → em dash
    except (TypeError, ValueError):
        return "—"


def _extraction_section(reg: ArtifactRegistry) -> list[str]:
    if not reg.features_metadata_json.exists():
        return []
    meta = json.loads(reg.features_metadata_json.read_text())
    stats = meta.get("sanity_checks", {})
    return [
        "## Feature extraction",
        "",
        f"- {meta.get('num_images', '?')} images → "
        f"{meta.get('embedding_dimension', '?')}-D embeddings "
        f"({meta.get('architecture', 'resnet18')}, weights: "
        f"`{meta.get('weights', 'unknown')}`) on `{meta.get('device', '?')}`.",
        f"- Sanity stats: mean |dim means| = "
        f"{_fmt(stats.get('mean_abs_mean'), 6)}, mean dim std = "
        f"{_fmt(stats.get('mean_std'), 6)}; "
        f"{meta.get('failed_images', 0)} failed decodes.",
        "",
    ]


def _training_section(reg: ArtifactRegistry) -> list[str]:
    import pandas as pd

    path = reg.results_comparison_detailed_csv
    if not path.exists():
        path = reg.results_comparison_csv
    if not path.exists():
        return []
    df = pd.read_csv(path, index_col=0)
    metric_cols = [
        c for c in ("accuracy", "precision", "recall", "f1", "fpr", "threshold")
        if c in df.columns
    ]
    lines = [
        "## Model results",
        "",
        "| Variant | " + " | ".join(metric_cols) + " |",
        "|---" * (len(metric_cols) + 1) + "|",
    ]
    for variant, row in df.iterrows():
        lines.append(
            f"| {variant} | "
            + " | ".join(_fmt(row.get(c)) for c in metric_cols)
            + " |"
        )
    lines.append("")
    if reg.operating_point_json.exists():
        op = json.loads(reg.operating_point_json.read_text())
        lines += [
            f"Deployment operating point: threshold "
            f"**{_fmt(op.get('threshold'))}** on `{op.get('model', '?')}` "
            f"(policy `{op.get('policy', '?')}`, target recall "
            f"{_fmt(op.get('target_recall'), 2)}, min precision "
            f"{_fmt(op.get('min_precision'), 2)}) — full manifest in "
            f"`notes/operating_point.json`.",
            "",
        ]
    return lines


def _sweep_section(reg: ArtifactRegistry) -> list[str]:
    import pandas as pd

    lines: list[str] = []
    for model in ("baseline", "semi"):
        path = reg.threshold_sweep_csv(model)
        if not path.exists():
            continue
        df = pd.read_csv(path)
        if "TPR" not in df.columns or df.empty:
            continue
        full_recall = df[df["TPR"] >= 1.0 - 1e-9]
        if full_recall.empty:
            continue
        best = full_recall.loc[full_recall["threshold"].idxmax()]
        lines.append(
            f"- {model}: largest threshold with TPR≈1.0 is "
            f"{_fmt(best['threshold'])} (FPR {_fmt(best.get('FPR'))}, "
            f"precision {_fmt(best.get('precision'))})."
        )
    if not lines:
        return []
    return ["## Threshold sweeps (screening: force TPR to 1.0)", "", *lines, ""]


def _clustering_section(reg: ArtifactRegistry) -> list[str]:
    import pandas as pd

    if not reg.clustering_metrics_csv.exists():
        return []
    df = pd.read_csv(reg.clustering_metrics_csv)
    lines = ["## Unsupervised analysis", ""]
    km = df[df["method"] == "kmeans"]
    if not km.empty:
        best = km.sort_values(
            ["ARI", "NMI", "silhouette"], ascending=False
        ).iloc[0]
        lines.append(
            f"- Best K-Means (`{best['params_json']}`): ARI "
            f"{_fmt(best['ARI'])}, NMI {_fmt(best['NMI'])}, silhouette "
            f"{_fmt(best['silhouette'])}."
        )
    db = df[df["method"] == "dbscan"]
    if not db.empty:
        best = db.sort_values(
            ["ARI", "NMI", "silhouette"], ascending=False
        ).iloc[0]
        lines.append(
            f"- Best DBSCAN (`{best['params_json']}`): silhouette "
            f"{_fmt(best['silhouette'])}, noise rate "
            f"{_fmt(best['noise_rate'])} — k-distance diagnostics under "
            f"`figures/kdist_plot_*.png`."
        )
    lines.append("")
    return lines


ARTIFACT_MAP = [
    ("features/embeddings.npy|.csv", "512-D frozen-backbone embeddings + row index"),
    ("features/metadata.json", "extraction provenance, digest, sanity stats"),
    ("features/standardized_features.npz", "z-scored feature bundle for clustering"),
    ("tables/results_comparison*.csv", "per-variant metric tables"),
    ("tables/metrics_clustering.csv / cluster_assignments.csv", "clustering sweep + per-image assignments"),
    ("tables/threshold_sweep_{baseline,semi}.csv", "full threshold sweeps"),
    ("tables/unlabeled_predictions_semi.csv", "triage CSV (prob + flagged per unlabeled image)"),
    ("notes/", "markdown reports, training_history.json, operating_point.json"),
    ("figures/", "training curves, confusion matrices, ROC/PR, cluster overlays"),
    ("models/*.pt", "best-validation checkpoints (torch-loadable msgpack)"),
]


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output-dir", type=Path, default=Path("outputs"))
    args = parser.parse_args(argv)
    reg = ArtifactRegistry(Path(args.output_dir))

    lines = [
        "# Outputs — run summary",
        "",
        f"Generated {datetime.now(timezone.utc).strftime('%Y-%m-%d %H:%M UTC')} "
        "by `scripts/generate_outputs_readme.py`. Everything under this "
        "directory is the pipeline's inter-stage artifact contract — later "
        "stages consume earlier stages' files by these exact names.",
        "",
    ]
    for section in (
        _extraction_section(reg),
        _training_section(reg),
        _sweep_section(reg),
        _clustering_section(reg),
    ):
        lines += section

    lines += ["## Artifact map", ""]
    lines += [f"- `{pattern}` — {desc}" for pattern, desc in ARTIFACT_MAP]
    lines.append("")

    reg.root.mkdir(parents=True, exist_ok=True)
    reg.outputs_readme_md.write_text("\n".join(lines))
    print(f"Wrote {reg.outputs_readme_md}")


if __name__ == "__main__":
    main()
