"""End-to-end analysis CLIs: audit → standardize → clustering → cohort export."""

import json

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def analysis_outputs(tmp_path_factory):
    """Run the full analysis chain on synthetic embeddings + tiny image tree."""
    from PIL import Image

    from src.clustering import main as clustering_main
    from src.data_audit import main as audit_main
    from src.export_unlabeled_cohort import main as cohort_main
    from src.standardize_features import main as standardize_main

    gen = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("ds")
    for cls in ("cancer", "normal"):
        d = root / "avec_labels" / cls
        d.mkdir(parents=True)
        for i in range(5):
            Image.fromarray(
                gen.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            ).save(d / f"{cls}_{i}.jpg")
    u = root / "sans_label"
    u.mkdir()
    for i in range(20):
        Image.fromarray(
            gen.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(u / f"u_{i:02d}.jpg")

    out = tmp_path_factory.mktemp("outputs")

    # audit
    audit_main(["--data-dir", str(root), "--sample-size", "16", "--output-dir", str(out)])

    # synthetic embeddings aligned with the discovery order (2 clusters + noise)
    n, d = 30, 24
    centers = gen.normal(0, 8, (2, d))
    emb = np.vstack(
        [centers[i % 2] + gen.normal(0, 1.0, d) for i in range(n)]
    ).astype(np.float32)
    (out / "features").mkdir(exist_ok=True)
    np.save(out / "features" / "embeddings.npy", emb)
    from ssip_tpu.data.discovery import discover_image_records

    records = discover_image_records(root)
    pd.DataFrame(
        [
            {"index": i, "path": str(r.relative_path), "bucket": r.bucket,
             "label": r.label}
            for i, r in enumerate(records)
        ]
    ).to_csv(out / "features" / "embeddings.csv", index=False)

    standardize_main(
        [
            "--embeddings-npy", str(out / "features" / "embeddings.npy"),
            "--embeddings-csv", str(out / "features" / "embeddings.csv"),
            "--output-npz", str(out / "features" / "standardized_features.npz"),
        ]
    )

    clustering_main(
        [
            "--features-npz", str(out / "features" / "standardized_features.npz"),
            "--output-root", str(out),
            "--kmeans-range", "2", "3",
            "--kmeans-n-init", "3",
            "--tsne-perplexities", "8",
            "--umap-neighbors", "8",
            "--umap-min-dist", "0.1",
            "--dbscan-eps", "4.0", "6.0",
            "--dbscan-min-samples", "3",
        ]
    )

    cohort_main(
        [
            "--assignments", str(out / "tables" / "cluster_assignments.csv"),
            "--method", "dbscan",
            "--output", str(out / "tables" / "unlabeled_cohort.csv"),
        ]
    )
    return root, out


class TestAuditArtifacts:
    def test_tables(self, analysis_outputs):
        _, out = analysis_outputs
        dir_summary = pd.read_csv(out / "tables" / "directory_summary.csv")
        assert list(dir_summary.columns) == ["bucket", "subdirectory", "file_count"]
        assert dir_summary["file_count"].sum() == 30
        labeled = dir_summary[dir_summary.bucket == "labeled"]
        assert set(labeled["subdirectory"]) == {"cancer", "normal"}

        sample = pd.read_csv(out / "tables" / "image_summary.csv")
        assert list(sample.columns) == [
            "bucket", "path", "width", "height", "mode", "format", "bytes",
            "readable", "aspect_ratio",
        ]
        assert len(sample) == 16
        assert sample["readable"].all()
        assert (sample["width"] == 32).all()

    def test_report_and_figures(self, analysis_outputs):
        _, out = analysis_outputs
        report = (out / "notes" / "data_audit.md").read_text()
        assert "# Data Audit Notes" in report
        assert "## Observations" in report
        for fig in ("sample_grid.png", "width_hist.png", "height_hist.png",
                    "aspect_hist.png"):
            assert (out / "figures" / fig).exists(), fig


class TestStandardizeArtifacts:
    def test_bundle_schema(self, analysis_outputs):
        _, out = analysis_outputs
        with np.load(out / "features" / "standardized_features.npz") as z:
            assert set(z.files) == {
                "features", "paths", "is_labeled", "labels",
                "scaler_mean", "scaler_scale",
            }
            feats = z["features"]
            assert feats.shape == (30, 24)
            np.testing.assert_allclose(feats.mean(axis=0), 0.0, atol=1e-4)
            np.testing.assert_allclose(feats.std(axis=0), 1.0, atol=1e-3)
            assert z["is_labeled"].sum() == 10
            labels = z["labels"]
            assert set(labels[z["is_labeled"]]) == {"cancer", "normal"}
            assert all(lbl == "" for lbl in labels[~z["is_labeled"]])


class TestClusteringArtifacts:
    def test_metrics_table(self, analysis_outputs):
        _, out = analysis_outputs
        metrics = pd.read_csv(out / "tables" / "metrics_clustering.csv")
        assert list(metrics.columns) == [
            "method", "space", "params_json", "ARI", "NMI", "silhouette",
            "noise_rate", "seed",
        ]
        assert set(metrics["method"]) == {"kmeans", "dbscan"}
        km = metrics[metrics.method == "kmeans"]
        assert len(km) == 2  # k=2,3
        # 2 well-separated synthetic clusters → k=2 must nail silhouette
        assert km["silhouette"].max() > 0.5

    def test_assignments_table(self, analysis_outputs):
        _, out = analysis_outputs
        assign = pd.read_csv(out / "tables" / "cluster_assignments.csv")
        assert list(assign.columns) == [
            "path", "cluster_kmeans", "cluster_dbscan", "pca_dim", "tsne_id",
            "umap_id", "is_labeled", "true_label",
        ]
        assert len(assign) == 30
        assert assign["tsne_id"].iloc[0] == "tsne_perp8"
        assert assign["umap_id"].iloc[0] == "umap_nn8_md0.10"

    def test_embeddings_and_figures(self, analysis_outputs):
        _, out = analysis_outputs
        emb_dir = out / "features" / "embeddings"
        names = {p.name for p in emb_dir.glob("*.npz")}
        assert names >= {
            "pca_cluster.npz", "pca_2d.npz", "pca_tsne_init.npz",
            "tsne_perp8.npz", "umap_nn8_md0.10.npz",
        }
        for fig in ("pca2d_clusters.png", "tsne2d_clusters.png", "umap2d_clusters.png"):
            assert (out / "figures" / fig).exists(), fig
        report = (out / "notes" / "clustering_report.md").read_text()
        assert "## Best K-Means Configuration" in report
        assert "## Standardization Checks" in report

    def test_cohort_export(self, analysis_outputs):
        _, out = analysis_outputs
        cohort = pd.read_csv(out / "tables" / "unlabeled_cohort.csv")
        assert list(cohort.columns) == ["path"]
        assert 0 < len(cohort) <= 20
        assert all(p.startswith("sans_label/") for p in cohort["path"])


def test_dbscan_auto_mode(analysis_outputs, tmp_path):
    from src.clustering import main as clustering_main

    _, out = analysis_outputs
    out2 = tmp_path / "outputs2"
    clustering_main(
        [
            "--features-npz", str(out / "features" / "standardized_features.npz"),
            "--output-root", str(out2),
            "--kmeans-range", "2",
            "--kmeans-n-init", "2",
            "--tsne-perplexities",
            "--umap-neighbors",
            "--dbscan-min-samples", "3",
            "--dbscan-scope", "unlabeled",
            "--dbscan-auto",
        ]
    )
    assert (out2 / "figures" / "kdist_plot_unlabeled_ms3.png").exists()
    # best-DBSCAN's scope k-distance figure (reference clustering.py:898-917)
    assert (out2 / "figures" / "kdist_plot_unlabeled.png").exists()
    metrics = pd.read_csv(out2 / "tables" / "metrics_clustering.csv")
    db = metrics[metrics.method == "dbscan"]
    assert len(db) == 3  # auto grid: {0.8, 1.0, 1.2}·base for one min_samples
    assert all("unlabeled" in s for s in db["space"])


def test_kdist_figure_follows_best_dbscan_scope(analysis_outputs, tmp_path):
    """Non-auto run scoped to labeled points: the k-distance figure must be
    kdist_plot_labeled.png over the labeled mask — the best DBSCAN's scope
    (reference src/clustering.py:898-917), not a hardcoded 'all'."""
    from src.clustering import main as clustering_main

    _, out = analysis_outputs
    out3 = tmp_path / "outputs3"
    clustering_main(
        [
            "--features-npz", str(out / "features" / "standardized_features.npz"),
            "--output-root", str(out3),
            "--kmeans-range", "2",
            "--kmeans-n-init", "2",
            "--tsne-perplexities",
            "--umap-neighbors",
            "--dbscan-eps", "4.0",
            "--dbscan-min-samples", "3",
            "--dbscan-scope", "labeled",
        ]
    )
    assert (out3 / "figures" / "kdist_plot_labeled.png").exists()
    assert not (out3 / "figures" / "kdist_plot_all.png").exists()
