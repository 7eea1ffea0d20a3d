"""Corpus-scale behavior of the dense analysis kernels (VERDICT r1 item 8):
each kernel either completes in bounded memory via its blocked path or
fails fast with an actionable message — never a silent O(N²) OOM wall.
"""

import numpy as np
import pytest

N_BIG = 50_000
DIM = 8


@pytest.fixture(scope="module")
def big_blobs():
    rng = np.random.default_rng(0)
    centers = rng.normal(0, 10, (4, DIM)).astype(np.float32)
    labels = rng.integers(0, 4, N_BIG)
    x = centers[labels] + rng.normal(0, 1, (N_BIG, DIM)).astype(np.float32)
    return x.astype(np.float32), labels


def test_silhouette_blocked_matches_dense():
    """The blocked path is numerically the dense path (checked below the
    switch threshold by calling both implementations directly)."""
    import jax.numpy as jnp

    from ssip_tpu.analysis.cluster_metrics import (
        _silhouette_sums_blocked,
        _silhouette_sums_dense,
    )

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1500, DIM)).astype(np.float32))
    dense_assign = rng.integers(0, 3, 1500)
    one_hot = jnp.asarray(np.eye(3, dtype=np.float32)[dense_assign])
    a = np.asarray(_silhouette_sums_dense(x, one_hot))
    b = np.asarray(_silhouette_sums_blocked(x, one_hot))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)


def test_silhouette_50k_bounded_memory(big_blobs):
    from ssip_tpu.analysis.cluster_metrics import silhouette_score

    x, labels = big_blobs
    s = silhouette_score(x, labels)
    assert np.isfinite(s)
    assert 0.0 < s <= 1.0  # well-separated blobs


def test_kdistance_50k_bounded_memory(big_blobs):
    from ssip_tpu.analysis.dbscan import k_distance_curve

    x, _ = big_blobs
    curve = k_distance_curve(x[: N_BIG // 2], k=5, include_self=True)
    assert curve.shape == (N_BIG // 2,)
    assert np.all(np.diff(curve) >= 0)


def test_dbscan_blocked_matches_dense():
    from ssip_tpu.analysis import dbscan as mod

    rng = np.random.default_rng(2)
    centers = rng.normal(0, 10, (3, DIM)).astype(np.float32)
    x = (
        centers[rng.integers(0, 3, 2000)]
        + rng.normal(0, 0.5, (2000, DIM)).astype(np.float32)
    ).astype(np.float32)

    import jax.numpy as jnp

    xj = jnp.asarray(x)
    dense = mod._neighbor_lists_dense(xj, eps=2.0)
    blocked = mod._neighbor_lists_blocked(xj, eps=2.0)
    assert len(dense) == len(blocked) == 2000
    for a, b in zip(dense, blocked):
        np.testing.assert_array_equal(a, b)


def test_dbscan_50k_bounded_memory(big_blobs):
    from ssip_tpu.analysis.dbscan import dbscan

    x, labels = big_blobs
    # subsample to 12k: above DENSE_LIMIT (8192) → exercises the blocked
    # path end-to-end; full 50k BFS is host-bound and adds nothing
    res = dbscan(x[:12_000], eps=3.0, min_samples=5)
    assert res.labels.shape == (12_000,)
    assert res.n_clusters >= 4 - 1  # blobs recovered (some may merge)
    assert res.noise_rate < 0.05


@pytest.mark.parametrize("algo", ["tsne", "umap"])
def test_visualization_embeddings_fail_fast(big_blobs, algo):
    x, _ = big_blobs
    if algo == "tsne":
        from ssip_tpu.analysis.tsne import tsne as fn
    else:
        from ssip_tpu.analysis.umap_jax import umap as fn
    with pytest.raises(ValueError, match="max_points"):
        fn(x)
