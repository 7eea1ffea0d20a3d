"""Clustering quality metrics in jnp: ARI, NMI, silhouette.

Replaces the reference's sklearn metric calls (reference clustering.py:
316-337). ARI/NMI run on the labeled subset only; silhouette on the full
clustering space (both per the reference's evaluation protocol). All three
reduce to dense matrix algebra on device: contingency tables as one-hot
matmuls and silhouette from the full pairwise-distance matrix.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ssip_tpu.analysis.blocked import CHUNK, DENSE_LIMIT


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


@jax.jit
def _silhouette_sums_dense(x: jnp.ndarray, one_hot: jnp.ndarray) -> jnp.ndarray:
    """[N, K] total distance from each sample to each cluster (full matrix)."""
    sq = jnp.sum(x * x, axis=1)
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * (x @ x.T), 0.0)
    return jnp.sqrt(d2) @ one_hot


@jax.jit
def _silhouette_sums_blocked(x: jnp.ndarray, one_hot: jnp.ndarray) -> jnp.ndarray:
    """Same sums with O(CHUNK·N) memory: one [CHUNK, N] distance tile at a
    time, scanned by XLA — the corpus-scale path (self-distance is 0 and
    contributes nothing, so no diagonal handling is needed)."""
    n = x.shape[0]
    padded = ((n + CHUNK - 1) // CHUNK) * CHUNK
    idx = jnp.minimum(jnp.arange(padded), n - 1)
    sq = jnp.sum(x * x, axis=1)

    def chunk_sums(start):
        rows = jax.lax.dynamic_slice(idx, (start,), (CHUNK,))
        xc = x[rows]
        d2 = jnp.maximum(sq[rows][:, None] + sq[None, :] - 2.0 * (xc @ x.T), 0.0)
        return jnp.sqrt(d2) @ one_hot  # [CHUNK, K]

    starts = jnp.arange(0, padded, CHUNK)
    return jax.lax.map(chunk_sums, starts).reshape(padded, -1)[:n]


def silhouette_score(
    X: np.ndarray, labels: np.ndarray, sample_mask: np.ndarray | None = None
) -> float:
    """Mean silhouette over the (optionally masked) samples.

    Vectorized: cluster-mean distances per sample as one [N, K] matmul of the
    pairwise-distance matrix against cluster one-hots. Singleton clusters
    score 0 (sklearn convention). Above DENSE_LIMIT rows the distance matrix
    is computed in row blocks — bounded memory at corpus scale.
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
    one_hot = jnp.eye(k, dtype=jnp.float32)[dense]  # [N, K]
    counts = jnp.sum(one_hot, axis=0)  # [K]
    sums = (
        _silhouette_sums_blocked(x, one_hot)
        if n > DENSE_LIMIT
        else _silhouette_sums_dense(x, one_hot)
    )

    own = counts[dense]  # [N]
    own_sum = sums[jnp.arange(n), dense]
    a = jnp.where(own > 1, own_sum / jnp.maximum(own - 1, 1), 0.0)

    mean_other = sums / jnp.maximum(counts, 1)[None, :]
    mean_other = mean_other.at[jnp.arange(n), dense].set(jnp.inf)
    b = jnp.min(mean_other, axis=1)

    s = jnp.where(own > 1, (b - a) / jnp.maximum(jnp.maximum(a, b), 1e-12), 0.0)
    return float(jnp.mean(s))
