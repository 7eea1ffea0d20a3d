"""End-to-end extraction pipeline on the synthetic tree (CPU, 8-dev mesh)."""

import json

import numpy as np
import pandas as pd

from src.feature_extraction import main as extraction_main


def test_extraction_cli_end_to_end(tiny_image_tree, tmp_path, monkeypatch):
    out = tmp_path / "outputs"
    monkeypatch.chdir(tmp_path)
    extraction_main(
        [
            "--data-dir", str(tiny_image_tree),
            "--device", "cpu",
            "--batch-size", "8",
            "--output-dir", str(out),
        ]
    )

    emb = np.load(out / "features" / "embeddings.npy")
    assert emb.shape == (22, 512)
    assert emb.dtype == np.float32
    assert np.isfinite(emb).all()

    df = pd.read_csv(out / "features" / "embeddings.csv")
    assert list(df.columns) == ["index", "path", "bucket", "label"]
    assert len(df) == 22
    assert (df["bucket"] == "labeled").sum() == 12
    assert df.iloc[0]["label"] == "cancer"
    # unlabeled rows carry empty label
    assert df[df.bucket == "unlabeled"]["label"].isna().all()

    meta = json.loads((out / "features" / "metadata.json").read_text())
    for key in (
        "backbone", "weights", "layer", "embedding_dimension", "input_resize",
        "input_crop", "normalization_mean", "normalization_std", "channel_policy",
        "date_utc", "num_images", "failed_images", "device", "dataset_dir",
        "dataset_digest", "sanity_checks", "neighbor_probe",
    ):
        assert key in meta, key
    assert meta["embedding_dimension"] == 512
    assert meta["num_images"] == 22
    assert meta["failed_images"] == 0
    assert len(meta["dataset_digest"]) == 64
    assert meta["sanity_checks"]["num_vectors"] == 22
    assert len(meta["neighbor_probe"]) == 8
    for probe in meta["neighbor_probe"]:
        assert probe["query"] != probe["neighbor"]
        assert -1.0001 <= probe["similarity"] <= 1.0001

    summary_md = (out / "notes" / "feature_summary.md").read_text()
    assert "# Feature Extraction Summary" in summary_md
    assert "Nearest Neighbor Spot Check" in summary_md
    assert (out / "logs" / "feature_extraction.log").exists()


def test_extraction_deterministic(tiny_image_tree, tmp_path):
    from ssip_tpu.pipelines.extraction import ExtractionConfig, run_extraction

    cfg = dict(
        data_dir=tiny_image_tree,
        device="cpu",
        batch_size=8,
        cache_decoded=False,
    )
    s1 = run_extraction(ExtractionConfig(output_dir=tmp_path / "o1", **cfg))
    s2 = run_extraction(ExtractionConfig(output_dir=tmp_path / "o2", **cfg))
    np.testing.assert_array_equal(s1.embeddings, s2.embeddings)
