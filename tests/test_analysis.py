"""Analysis stack vs sklearn/scipy oracles."""

import numpy as np
import pytest
from sklearn.cluster import DBSCAN as SkDBSCAN, KMeans as SkKMeans
from sklearn.datasets import make_blobs
from sklearn.decomposition import PCA as SkPCA
from sklearn.metrics import (
    adjusted_rand_score,
    normalized_mutual_info_score,
    silhouette_score as sk_silhouette,
)
from sklearn.preprocessing import StandardScaler

from ssip_tpu.analysis.cluster_metrics import (
    adjusted_rand_index,
    normalized_mutual_info,
    silhouette_score,
)
from ssip_tpu.analysis.dbscan import auto_eps_from_kdistance, dbscan, k_distance_curve
from ssip_tpu.analysis.kmeans import kmeans
from ssip_tpu.analysis.pca import components_for_variance, fit_pca
from ssip_tpu.analysis.standardize import fit_scaler, transform


@pytest.fixture(scope="module")
def blobs():
    X, y = make_blobs(
        n_samples=300, centers=4, n_features=16, random_state=0, cluster_std=1.0
    )
    return X.astype(np.float32), y


class TestStandardize:
    def test_matches_sklearn(self, rng):
        X = rng.normal(2.0, 3.0, (50, 8)).astype(np.float32)
        X[:, 3] = 7.0  # zero-variance column
        scaler = fit_scaler(X)
        Z = transform(X, scaler)
        ref = StandardScaler().fit_transform(X)
        np.testing.assert_allclose(Z, ref, atol=1e-4)


class TestPCA:
    def test_matches_sklearn(self, blobs):
        X, _ = blobs
        model = fit_pca(X)
        ref = SkPCA(svd_solver="full").fit(X)
        np.testing.assert_allclose(
            model.explained_variance_ratio, ref.explained_variance_ratio_, atol=1e-5
        )
        ours = model.transform(X, 4)
        theirs = ref.transform(X)[:, :4]
        np.testing.assert_allclose(ours, theirs, atol=2e-2)

    def test_components_for_variance(self, blobs):
        X, _ = blobs
        model = fit_pca(X)
        ref = SkPCA(n_components=0.9, svd_solver="full").fit(X)
        assert components_for_variance(model, 0.9) == ref.n_components_


class TestKMeans:
    def test_recovers_blobs(self, blobs):
        X, y = blobs
        result = kmeans(X, 4, n_init=10, seed=42)
        assert adjusted_rand_score(y, result.labels) > 0.99

    def test_inertia_close_to_sklearn(self, blobs):
        X, _ = blobs
        ours = kmeans(X, 4, n_init=10, seed=42)
        ref = SkKMeans(n_clusters=4, n_init=10, random_state=42).fit(X)
        assert ours.inertia == pytest.approx(ref.inertia_, rel=1e-3)

    def test_deterministic(self, blobs):
        X, _ = blobs
        a = kmeans(X, 3, seed=42)
        b = kmeans(X, 3, seed=42)
        np.testing.assert_array_equal(a.labels, b.labels)

    def test_more_clusters_than_natural(self, blobs):
        X, _ = blobs
        result = kmeans(X, 10, n_init=5, seed=1)
        assert len(np.unique(result.labels)) == 10  # no empty clusters


class TestDBSCAN:
    def test_matches_sklearn_labels(self, blobs):
        X, _ = blobs
        for eps, ms in [(2.0, 5), (3.0, 10), (1.0, 5)]:
            ours = dbscan(X, eps, ms)
            ref = SkDBSCAN(eps=eps, min_samples=ms).fit(X)
            # cluster ids may permute; compare via ARI + identical noise mask
            assert adjusted_rand_score(ref.labels_, ours.labels) == pytest.approx(1.0)
            np.testing.assert_array_equal(ours.labels == -1, ref.labels_ == -1)
            np.testing.assert_array_equal(
                ours.core_mask, np.isin(np.arange(len(X)), ref.core_sample_indices_)
            )

    def test_kdistance_blocked_matches_dense(self, blobs):
        from ssip_tpu.analysis import dbscan as D

        X, _ = blobs
        dense = k_distance_curve(X, 5, include_self=True)
        blocked = np.sort(
            np.sqrt(np.asarray(D._kth_distance_blocked(np.asarray(X, np.float32), 5, True)))
        )
        np.testing.assert_allclose(blocked, dense, atol=1e-4)
        # self-excluded variant too
        dense2 = k_distance_curve(X, 5, include_self=False)
        blocked2 = np.sort(
            np.sqrt(np.asarray(D._kth_distance_blocked(np.asarray(X, np.float32), 5, False)))
        )
        np.testing.assert_allclose(blocked2, dense2, atol=1e-4)

    def test_kdistance_and_auto_eps(self, blobs):
        X, _ = blobs
        curve = k_distance_curve(X, 5)
        assert np.all(np.diff(curve) >= -1e-5)
        from sklearn.neighbors import NearestNeighbors

        nn = NearestNeighbors(n_neighbors=6).fit(X)  # incl self
        ref_curve = np.sort(nn.kneighbors(X)[0][:, -1])
        np.testing.assert_allclose(curve, ref_curve, atol=1e-3)
        # auto-eps: exact reference semantics (self-inclusive kNN + order
        # statistic at round(q*(n-1)) — reference clustering.py:430-438)
        nn_ref = NearestNeighbors(n_neighbors=5).fit(X)
        kth = np.sort(nn_ref.kneighbors(X)[0][:, -1])
        idx = int(np.clip(round(0.98 * (len(kth) - 1)), 0, len(kth) - 1))
        eps = auto_eps_from_kdistance(X, 5, 0.98)
        assert eps == pytest.approx(float(kth[idx]), abs=1e-3)


class TestClusterMetrics:
    def test_ari_matches_sklearn(self, rng):
        for _ in range(5):
            a = rng.integers(0, 4, 100)
            b = rng.integers(-1, 3, 100)  # includes noise label
            assert adjusted_rand_index(a, b) == pytest.approx(
                adjusted_rand_score(a, b), abs=1e-10
            )

    def test_nmi_matches_sklearn(self, rng):
        for _ in range(5):
            a = rng.integers(0, 4, 100)
            b = rng.integers(0, 5, 100)
            assert normalized_mutual_info(a, b) == pytest.approx(
                normalized_mutual_info_score(a, b), abs=1e-9
            )

    def test_silhouette_matches_sklearn(self, blobs):
        X, y = blobs
        assert silhouette_score(X, y) == pytest.approx(
            sk_silhouette(X, y), abs=1e-4
        )

    def test_silhouette_with_mask(self, blobs):
        X, y = blobs
        mask = np.arange(len(y)) < 150
        ours = silhouette_score(X, y, sample_mask=mask)
        ref = sk_silhouette(X[mask], y[mask])
        assert ours == pytest.approx(ref, abs=1e-4)


class TestEmbeddings:
    def test_tsne_separates_blobs(self):
        from ssip_tpu.analysis.tsne import tsne

        X, y = make_blobs(n_samples=120, centers=3, n_features=10, random_state=1)
        Y = tsne(X.astype(np.float32), perplexity=20, n_iter=300)
        assert Y.shape == (120, 2)
        assert np.isfinite(Y).all()
        # clusters must remain separable in the embedding
        assert sk_silhouette(Y, y) > 0.3

    def test_umap_separates_blobs(self):
        from ssip_tpu.analysis.umap_jax import umap

        X, y = make_blobs(n_samples=120, centers=3, n_features=10, random_state=1)
        Y = umap(X.astype(np.float32), n_neighbors=10, min_dist=0.1, n_epochs=100)
        assert Y.shape == (120, 2)
        assert np.isfinite(Y).all()
        assert sk_silhouette(Y, y) > 0.3

    def test_umap_ab_params(self):
        from ssip_tpu.analysis.umap_jax import fit_ab

        a, b = fit_ab(0.1)
        # published umap-learn values for min_dist=0.1, spread=1.0
        assert a == pytest.approx(1.577, abs=0.05)
        assert b == pytest.approx(0.895, abs=0.05)
