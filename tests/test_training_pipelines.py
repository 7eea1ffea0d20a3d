"""End-to-end supervised + semi-supervised + threshold-sweep pipelines.

Small configs (32×32 inputs, 1-2 epochs) on the CPU mesh; asserts the full
artifact contract of SURVEY.md §3.2-3.5.
"""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from ssip_tpu.pipelines.semi_supervised import run_pipeline
from ssip_tpu.pipelines.supervised import run_supervised
from ssip_tpu.pipelines.sweep import SweepConfig, run_sweep
from ssip_tpu.pipelines.train_config import TrainingConfig


@pytest.fixture(scope="module")
def trained_outputs(tmp_path_factory):
    """One semi-supervised run shared by the artifact assertions below."""
    from PIL import Image

    gen = np.random.default_rng(3)
    root = tmp_path_factory.mktemp("ds")
    # separable classes: cancer=bright, normal=dark
    for cls, lo, hi in (("cancer", 150, 255), ("normal", 0, 100)):
        d = root / "avec_labels" / cls
        d.mkdir(parents=True)
        for i in range(10):
            Image.fromarray(
                gen.integers(lo, hi, (48, 48, 3), dtype=np.uint8)
            ).save(d / f"{cls}_{i:02d}.jpg")
    u = root / "sans_label"
    u.mkdir()
    for i in range(12):
        lo, hi = (150, 255) if i % 2 else (0, 100)
        Image.fromarray(
            gen.integers(lo, hi, (48, 48, 3), dtype=np.uint8)
        ).save(u / f"u_{i:02d}.jpg")

    out = tmp_path_factory.mktemp("outputs")
    cfg = TrainingConfig(
        strong_data_dir=root / "avec_labels",
        weak_data_dir=root / "sans_label",
        batch_size=8,
        image_size=32,
        baseline_epochs=2,
        weak_pretrain_epochs=1,
        finetune_epochs=1,
        pseudo_label_threshold=0.55,
        target_recall=0.9,
        min_precision=0.5,
        output_dir=out,
        device="cpu",
    )
    results = run_pipeline(cfg)
    return root, out, cfg, results


class TestSemiSupervisedArtifacts:
    def test_results_keys(self, trained_outputs):
        _, _, _, results = trained_outputs
        assert set(results) == {"baseline_thresholded", "semi_thresholded"}
        for row in results.values():
            for key in ("accuracy", "precision", "recall", "f1", "threshold",
                        "threshold_policy", "training_time_sec"):
                assert key in row

    def test_history_schema(self, trained_outputs):
        _, out, _, _ = trained_outputs
        payload = json.loads((out / "notes" / "training_history.json").read_text())
        assert set(payload) == {
            "arch", "image_size", "baseline", "semi_pretrain",
            "semi_finetune", "splits", "pseudo_label_count",
        }
        assert payload["arch"] == "resnet18"
        assert payload["image_size"] > 0  # sweep/serving eval at this size
        assert payload["pseudo_label_count"] > 0
        splits = payload["splits"]
        assert set(splits) == {"train", "val", "test"}
        assert len(splits["train"]) == 12 and len(splits["val"]) == 4
        for phase in ("baseline", "semi_pretrain", "semi_finetune"):
            assert set(payload[phase]) == {
                "train_loss", "val_loss", "train_acc", "val_acc",
                "train_f1", "val_f1",
            }

    def test_tables(self, trained_outputs):
        _, out, _, _ = trained_outputs
        detailed = pd.read_csv(
            out / "tables" / "results_comparison_detailed.csv", index_col=0
        )
        assert list(detailed.index) == [
            "baseline_argmax", "baseline_thresholded", "semi_argmax",
            "semi_thresholded",
        ]
        for col in ("TP", "FP", "TN", "FN", "TPR", "FPR", "precision",
                    "recall", "accuracy", "threshold"):
            assert col in detailed.columns
        comparison = pd.read_csv(out / "tables" / "results_comparison.csv", index_col=0)
        assert list(comparison.index) == ["baseline_thresholded", "semi_thresholded"]

    def test_figures(self, trained_outputs):
        _, out, _, _ = trained_outputs
        figures = {p.name for p in (out / "figures").glob("*.png")}
        assert figures >= {
            "train_curves_baseline.png", "train_curves_semi.png",
            "confusion_matrix_baseline.png",
            "confusion_matrix_baseline_thresholded.png",
            "confusion_matrix_semi.png", "confusion_matrix_semi_thresholded.png",
            "roc_curves.png", "pr_curves.png", "metrics_comparison.png",
        }

    def test_operating_point_and_triage(self, trained_outputs):
        _, out, cfg, results = trained_outputs
        op = json.loads((out / "notes" / "operating_point.json").read_text())
        assert op["model"] == "semi_supervised_resnet18"
        assert op["positive_class"] == "cancer"
        assert op["threshold"] == results["semi_thresholded"]["threshold"]
        assert op["seed"] == 42

        triage = pd.read_csv(out / "tables" / "unlabeled_predictions_semi.csv")
        assert list(triage.columns) == ["path", "prob_positive", "flagged"]
        assert len(triage) == 12  # full pool
        assert triage["flagged"].dtype == bool

    def test_checkpoints_torch_loadable(self, trained_outputs):
        import torch

        _, out, _, _ = trained_outputs
        for name in ("baseline_resnet18.pt", "semi_resnet18.pt"):
            sd = torch.load(out / "models" / name, weights_only=True)
            assert "conv1.weight" in sd
            assert sd["conv1.weight"].shape == (64, 3, 7, 7)
            assert "fc.weight" in sd and sd["fc.weight"].shape == (2, 512)

    def test_threshold_sweep_consumes_artifacts(self, trained_outputs, capsys):
        root, out, _, _ = trained_outputs
        result = run_sweep(
            SweepConfig(
                strong_data_dir=root / "avec_labels",
                output_dir=out,
                model="semi",
                image_size=32,
                batch_size=8,
            )
        )
        assert "csv" in result
        sweep_df = pd.read_csv(out / "tables" / "threshold_sweep_semi.csv")
        assert list(sweep_df.columns) == [
            "threshold", "TP", "FP", "TN", "FN", "TPR", "TNR", "FPR",
            "precision", "accuracy",
        ]
        # descending thresholds, 1.0 → 0.0
        assert sweep_df["threshold"].iloc[0] == 1.0
        assert sweep_df["threshold"].iloc[-1] == 0.0
        assert (sweep_df["threshold"].diff()[1:] <= 0).all()
        if "best_threshold" in result:
            assert result["TPR"] >= 0.999999


def test_semi_pipeline_with_consistency(trained_outputs, tmp_path):
    """--consistency-weight > 0 switches fine-tuning to FixMatch mode."""
    root, _, base_cfg, _ = trained_outputs
    out = tmp_path / "outputs_fm"
    cfg = TrainingConfig(
        strong_data_dir=root / "avec_labels",
        weak_data_dir=root / "sans_label",
        batch_size=8,
        image_size=32,
        baseline_epochs=1,
        weak_pretrain_epochs=1,
        finetune_epochs=1,
        pseudo_label_threshold=0.55,
        target_recall=0.9,
        output_dir=out,
        device="cpu",
        consistency_weight=1.0,
        consistency_threshold=0.6,
    )
    results = run_pipeline(cfg)
    assert set(results) == {"baseline_thresholded", "semi_thresholded"}
    payload = json.loads((out / "notes" / "training_history.json").read_text())
    assert set(payload["semi_finetune"]) == {
        "train_loss", "val_loss", "train_acc", "val_acc", "train_f1", "val_f1",
    }
    assert (out / "models" / "semi_resnet18.pt").exists()


def test_outputs_readme_generated(trained_outputs):
    """scripts/generate_outputs_readme.py summarizes whatever artifacts the
    run produced (reference ships outputs/README.md — /root/reference/
    outputs/README.md:1-8)."""
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from generate_outputs_readme import main as readme_main

    _, out, _, _ = trained_outputs
    readme_main(["--output-dir", str(out)])
    text = (out / "README.md").read_text()
    assert "# Outputs — run summary" in text
    assert "## Model results" in text
    assert "semi_thresholded" in text
    assert "operating point" in text.lower()
    assert "## Artifact map" in text


def test_bf16_training_matches_f32_metrics(tmp_path):
    """--compute-dtype bfloat16 training agrees with f32 at the metric level
    (same tiny run): same final argmax decisions on the separable data and
    loss trajectories within bf16 tolerance. Params/BN/loss stay f32 by
    construction — only conv/matmul activations drop precision."""
    from PIL import Image

    gen = np.random.default_rng(9)
    root = tmp_path / "ds"
    for cls, lo, hi in (("cancer", 150, 255), ("normal", 0, 100)):
        d = root / "avec_labels" / cls
        d.mkdir(parents=True)
        for i in range(10):
            Image.fromarray(
                gen.integers(lo, hi, (48, 48, 3), dtype=np.uint8)
            ).save(d / f"{cls}_{i:02d}.jpg")

    def run(dtype: str, out: Path):
        return run_supervised(
            TrainingConfig(
                strong_data_dir=root / "avec_labels",
                batch_size=8,
                image_size=32,
                baseline_epochs=2,
                output_dir=out,
                device="cpu",
                compute_dtype=dtype,
            )
        )

    res_f32 = run("float32", tmp_path / "o_f32")
    res_bf16 = run("bfloat16", tmp_path / "o_bf16")

    hist_f32 = json.loads((tmp_path / "o_f32/notes/training_history.json").read_text())
    hist_bf16 = json.loads((tmp_path / "o_bf16/notes/training_history.json").read_text())
    f32_loss = np.asarray(hist_f32["baseline"]["train_loss"])
    bf16_loss = np.asarray(hist_bf16["baseline"]["train_loss"])
    # bf16 has ~3 decimal digits; epoch-mean CE losses should track closely
    np.testing.assert_allclose(bf16_loss, f32_loss, rtol=0.1, atol=0.05)
    # metric-level parity on the (separable) test split
    for key in ("accuracy", "f1"):
        assert abs(
            res_bf16["baseline_argmax"][key] - res_f32["baseline_argmax"][key]
        ) <= 0.25 + 1e-9  # one sample flip on the 4-sample test split


def test_supervised_pipeline_minimal(tmp_path):
    from PIL import Image

    gen = np.random.default_rng(5)
    root = tmp_path / "ds"
    for cls, lo, hi in (("cancer", 150, 255), ("normal", 0, 100)):
        d = root / "avec_labels" / cls
        d.mkdir(parents=True)
        for i in range(8):
            Image.fromarray(
                gen.integers(lo, hi, (48, 48, 3), dtype=np.uint8)
            ).save(d / f"{cls}_{i:02d}.jpg")

    out = tmp_path / "outputs"
    results = run_supervised(
        TrainingConfig(
            strong_data_dir=root / "avec_labels",
            batch_size=8,
            image_size=32,
            baseline_epochs=2,
            output_dir=out,
            device="cpu",
        )
    )
    assert results["baseline_thresholded"]["threshold_policy"] == "disabled"
    assert (out / "tables" / "results_comparison.csv").exists()
    assert (out / "models" / "baseline_resnet18.pt").exists()
    assert (out / "notes" / "training_history.json").exists()
