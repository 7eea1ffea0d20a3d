"""Clustering quality metrics in jnp: ARI, NMI, silhouette.

Replaces the reference's sklearn metric calls (reference clustering.py:
316-337). ARI/NMI run on the labeled subset only; silhouette on the full
clustering space (both per the reference's evaluation protocol). All three
reduce to dense matrix algebra on device: contingency tables as one-hot
matmuls and silhouette from the full pairwise-distance matrix.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _contingency(labels_a: np.ndarray, labels_b: np.ndarray) -> np.ndarray:
    """[Ca, Cb] float64 contingency table (host — exact counts for ARI/NMI)."""
    _, a = np.unique(labels_a, return_inverse=True)
    _, b = np.unique(labels_b, return_inverse=True)
    ca, cb = int(a.max()) + 1, int(b.max()) + 1
    table = np.zeros((ca, cb), np.float64)
    np.add.at(table, (a, b), 1.0)
    return table


def adjusted_rand_index(labels_true: np.ndarray, labels_pred: np.ndarray) -> float:
    """ARI from the contingency table (Hubert & Arabie)."""
    labels_true = np.asarray(labels_true)
    labels_pred = np.asarray(labels_pred)
    n = labels_true.size
    if n < 2:
        return 1.0
    c = _contingency(labels_true, labels_pred)

    def comb2(x):
        return x * (x - 1.0) / 2.0

    sum_comb = comb2(c).sum()
    sum_a = comb2(c.sum(axis=1)).sum()
    sum_b = comb2(c.sum(axis=0)).sum()
    expected = sum_a * sum_b / comb2(float(n))
    max_index = (sum_a + sum_b) / 2.0
    denom = max_index - expected
    if denom == 0.0:
        return 1.0
    return float((sum_comb - expected) / denom)


def normalized_mutual_info(labels_true: np.ndarray, labels_pred: np.ndarray) -> float:
    """NMI with arithmetic-mean normalization (sklearn default)."""
    labels_true = np.asarray(labels_true)
    labels_pred = np.asarray(labels_pred)
    n = labels_true.size
    if n == 0:
        return 0.0
    c = _contingency(labels_true, labels_pred) / n
    pa = c.sum(axis=1)
    pb = c.sum(axis=0)
    outer = pa[:, None] * pb[None, :]
    nz = c > 0
    mi = float(np.sum(np.where(nz, c * np.log(np.where(nz, c / outer, 1.0)), 0.0)))

    def entropy(p):
        nzp = p > 0
        return -float(np.sum(np.where(nzp, p * np.log(np.where(nzp, p, 1.0)), 0.0)))

    mean_h = (entropy(pa) + entropy(pb)) / 2.0
    if mean_h == 0.0:
        return 1.0
    return float(np.clip(mi / mean_h, 0.0, 1.0))


def silhouette_score(
    X: np.ndarray, labels: np.ndarray, sample_mask: np.ndarray | None = None
) -> float:
    """Mean silhouette over the (optionally masked) samples.

    Vectorized: cluster-mean distances per sample as one [N, K] matmul of the
    pairwise-distance matrix against cluster one-hots. Singleton clusters
    score 0 (sklearn convention).
    """
    labels = np.asarray(labels)
    if sample_mask is not None:
        X = np.asarray(X)[sample_mask]
        labels = labels[sample_mask]
    uniq, dense = np.unique(labels, return_inverse=True)
    k = len(uniq)
    n = len(labels)
    if k < 2 or n < 2:
        raise ValueError("silhouette requires 2 <= n_clusters < n_samples")

    x = jnp.asarray(X, jnp.float32)
    sq = jnp.sum(x * x, axis=1)
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * (x @ x.T), 0.0)
    dist = jnp.sqrt(d2)

    one_hot = jnp.eye(k, dtype=jnp.float32)[dense]  # [N, K]
    counts = jnp.sum(one_hot, axis=0)  # [K]
    sums = dist @ one_hot  # [N, K] — total distance to each cluster

    own = counts[dense]  # [N]
    own_sum = sums[jnp.arange(n), dense]
    a = jnp.where(own > 1, own_sum / jnp.maximum(own - 1, 1), 0.0)

    mean_other = sums / jnp.maximum(counts, 1)[None, :]
    mean_other = mean_other.at[jnp.arange(n), dense].set(jnp.inf)
    b = jnp.min(mean_other, axis=1)

    s = jnp.where(own > 1, (b - a) / jnp.maximum(jnp.maximum(a, b), 1e-12), 0.0)
    return float(jnp.mean(s))
