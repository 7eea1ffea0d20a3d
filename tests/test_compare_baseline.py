"""Unit tests for the pretrained-regime parity comparator.

scripts/compare_baseline.py is the gate scripts/reproduce_baseline.sh runs
after the full workflow; these tests mock the two artifacts it reads
(outputs/features/metadata.json and outputs/tables/results_comparison.csv —
the reference artifact contract) and verify the pass/fail logic both ways,
so the day a checkpoint is available the comparison is known-good.
"""

from __future__ import annotations

import csv
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

from compare_baseline import compare  # noqa: E402


def _write_artifacts(
    root: Path,
    *,
    weights: str,
    mean_abs_mean: float,
    mean_std: float,
    rows: dict,
) -> None:
    (root / "features").mkdir(parents=True)
    (root / "tables").mkdir(parents=True)
    (root / "features/metadata.json").write_text(json.dumps({
        "weights": weights,
        "sanity_checks": {
            "mean_abs_mean": mean_abs_mean,
            "mean_std": mean_std,
        },
    }))
    with open(root / "tables/results_comparison.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["", "accuracy", "precision", "recall", "f1"])
        for name, (acc, prec, rec, f1) in rows.items():
            w.writerow([name, acc, prec, rec, f1])


REFERENCE_ROWS = {
    "baseline_thresholded": (0.90, 0.90, 0.90, 0.90),
    "semi_thresholded": (0.95, 1.00, 0.90, 0.947),
}


def test_compare_passes_on_reference_numbers(tmp_path):
    _write_artifacts(
        tmp_path, weights="torchvision:IMAGENET1K_V1",
        mean_abs_mean=0.884986, mean_std=0.581787, rows=REFERENCE_ROWS,
    )
    rows, ok = compare(tmp_path)
    assert ok, rows
    assert len(rows) == 8  # 2 embedding stats + 3 metrics × 2 models


def test_compare_passes_within_tolerance(tmp_path):
    _write_artifacts(
        tmp_path, weights="torchvision:IMAGENET1K_V1",
        mean_abs_mean=0.8855, mean_std=0.5820,
        rows={
            "baseline_thresholded": (0.90, 0.90, 0.905, 0.895),
            "semi_thresholded": (0.95, 1.00, 0.893, 0.952),
        },
    )
    _, ok = compare(tmp_path)
    assert ok


def test_compare_fails_on_f1_outside_tolerance(tmp_path):
    bad = dict(REFERENCE_ROWS)
    bad["semi_thresholded"] = (0.95, 1.00, 0.90, 0.92)  # F1 off by 0.027
    _write_artifacts(
        tmp_path, weights="torchvision:IMAGENET1K_V1",
        mean_abs_mean=0.884986, mean_std=0.581787, rows=bad,
    )
    rows, ok = compare(tmp_path)
    assert not ok
    failing = [r[0] for r in rows if not r[4]]
    assert failing == ["semi_thresholded.f1"]


def test_compare_fails_on_embedding_stats_drift(tmp_path):
    _write_artifacts(
        tmp_path, weights="torchvision:IMAGENET1K_V1",
        mean_abs_mean=0.94, mean_std=0.166,  # the seeded-init stats
        rows=REFERENCE_ROWS,
    )
    rows, ok = compare(tmp_path)
    assert not ok
    failing = {r[0] for r in rows if not r[4]}
    assert failing == {"embedding.mean_abs_mean", "embedding.mean_std"}


def test_compare_random_init_is_informational(tmp_path):
    # without a pretrained checkpoint nothing can match — the comparator
    # must degrade to informational rows, not spurious failures
    _write_artifacts(
        tmp_path, weights="random_init:seed=42",
        mean_abs_mean=0.94, mean_std=0.166,
        rows={
            "baseline_thresholded": (0.80, 0.875, 0.70, 0.778),
            "semi_thresholded": (0.70, 0.833, 0.50, 0.625),
        },
    )
    rows, ok = compare(tmp_path)
    assert ok
    assert all("informational" in r[0] for r in rows)
