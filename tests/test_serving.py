"""Serving path: predictor consistency with training-time triage + CLI."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    from PIL import Image

    from ssip_tpu.pipelines.semi_supervised import run_pipeline
    from ssip_tpu.pipelines.train_config import TrainingConfig

    gen = np.random.default_rng(11)
    root = tmp_path_factory.mktemp("ds")
    for cls, lo, hi in (("cancer", 150, 255), ("normal", 0, 100)):
        d = root / "avec_labels" / cls
        d.mkdir(parents=True)
        for i in range(8):
            Image.fromarray(
                gen.integers(lo, hi, (48, 48, 3), dtype=np.uint8)
            ).save(d / f"{cls}_{i}.jpg")
    u = root / "sans_label"
    u.mkdir()
    for i in range(10):
        lo, hi = (150, 255) if i % 2 else (0, 100)
        Image.fromarray(
            gen.integers(lo, hi, (48, 48, 3), dtype=np.uint8)
        ).save(u / f"u_{i:02d}.jpg")

    out = tmp_path_factory.mktemp("out")
    run_pipeline(
        TrainingConfig(
            strong_data_dir=root / "avec_labels",
            weak_data_dir=root / "sans_label",
            batch_size=8, image_size=32,
            baseline_epochs=1, weak_pretrain_epochs=1, finetune_epochs=1,
            pseudo_label_threshold=0.55, target_recall=0.9,
            output_dir=out, device="cpu",
        )
    )
    return root, out


def test_predictor_matches_training_triage(trained_run):
    from ssip_tpu.serving import ScreeningPredictor

    import json

    root, out = trained_run
    predictor = ScreeningPredictor.from_artifacts(
        out, model="semi", image_size=32, batch_size=8, compute_dtype="float32"
    )
    paths = sorted((root / "sans_label").glob("*.jpg"))
    result = predictor.predict_paths(paths)

    triage = pd.read_csv(out / "tables" / "unlabeled_predictions_semi.csv")
    np.testing.assert_allclose(
        result.prob_positive, triage["prob_positive"].to_numpy(), atol=1e-5
    )
    np.testing.assert_array_equal(result.flagged, triage["flagged"].to_numpy())
    op = json.loads((out / "notes" / "operating_point.json").read_text())
    assert result.threshold == pytest.approx(op["threshold"])


def test_predict_cli(trained_run, tmp_path):
    from src.predict import main

    root, out = trained_run
    dest = tmp_path / "preds.csv"
    main(
        [
            "--images", str(root / "sans_label"),
            "--model", "semi",
            "--output-dir", str(out),
            "--output", str(dest),
            "--batch-size", "8",
        ]
    )
    df = pd.read_csv(dest)
    assert list(df.columns) == ["path", "prob_positive", "flagged"]
    assert len(df) == 10


def test_threshold_override(trained_run):
    from ssip_tpu.serving import ScreeningPredictor

    root, out = trained_run
    predictor = ScreeningPredictor.from_artifacts(
        out, model="semi", image_size=32, batch_size=8
    )
    predictor.threshold = 0.0
    paths = sorted((root / "sans_label").glob("*.jpg"))[:4]
    result = predictor.predict_paths(paths)
    assert result.flagged.all()  # threshold 0 flags everything

def test_bundle_falls_back_to_training_history(trained_run, tmp_path):
    """Without operating_point.json (threshold policy disabled), the bundle
    must still rebuild the recorded arch at the recorded resolution from
    training_history.json instead of assuming a 224px resnet18."""
    import json
    import shutil

    from ssip_tpu.serving import load_serving_bundle

    root, out = trained_run
    run2 = tmp_path / "no_op_point"
    shutil.copytree(out, run2)
    (run2 / "notes" / "operating_point.json").unlink()
    hist_path = run2 / "notes" / "training_history.json"
    hist = json.loads(hist_path.read_text())
    assert hist["arch"] == "resnet18" and hist["image_size"] == 32

    bundle = load_serving_bundle(run2, model="semi")
    assert bundle.arch == "resnet18"
    assert bundle.image_size == 32
    assert bundle.threshold == 0.5  # warned default, not the calibrated one
