"""DBSCAN with device-side neighborhood computation.

TPU-native replacement for sklearn DBSCAN (reference clustering.py:376-428):
the O(N²) radius-neighbor query — the actual compute — runs as one jnp
pairwise-distance matrix on device; the (cheap, inherently sequential)
cluster expansion is a host BFS in index order, reproducing sklearn's
labeling semantics: core points (≥ min_samples neighbors incl. self) seed
clusters in index order; border points join the first core cluster that
reaches them; everything else is noise (-1).

Also provides the k-distance curve for the reference's ``--dbscan-auto``
eps selection (98th-percentile quantile, reference clustering.py:430-438).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class DBSCANResult:
    labels: np.ndarray  # [N] cluster ids, -1 = noise
    core_mask: np.ndarray  # [N] bool
    n_clusters: int
    noise_rate: float


@jax.jit
def _pairwise_d2(x: jnp.ndarray) -> jnp.ndarray:
    sq = jnp.sum(x * x, axis=1)
    return jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * (x @ x.T), 0.0)


def dbscan(X: np.ndarray, eps: float, min_samples: int) -> DBSCANResult:
    x = jnp.asarray(np.asarray(X, np.float32))
    d2 = np.asarray(_pairwise_d2(x))
    adjacency = d2 <= float(eps) ** 2  # includes self
    neighbor_counts = adjacency.sum(axis=1)
    core = neighbor_counts >= min_samples

    n = len(core)
    labels = np.full(n, -1, np.int64)
    cluster = 0
    for i in range(n):
        if not core[i] or labels[i] != -1:
            continue
        labels[i] = cluster
        queue = deque([i])
        while queue:
            j = queue.popleft()
            if not core[j]:
                continue
            for nb in np.nonzero(adjacency[j])[0]:
                if labels[nb] == -1:
                    labels[nb] = cluster
                    if core[nb]:
                        queue.append(nb)
        cluster += 1

    noise_rate = float((labels == -1).mean()) if n else 0.0
    return DBSCANResult(
        labels=labels, core_mask=core, n_clusters=cluster, noise_rate=noise_rate
    )


# Above this many rows, the [N, N] distance matrix stops fitting comfortably
# and the k-distance computation switches to blocked row-chunks (bounded
# memory: one [CHUNK, N] tile at a time, scanned by XLA).
_DENSE_LIMIT = 8192
_CHUNK = 1024


@partial(jax.jit, static_argnames=("k", "include_self"))
def _kth_distance_blocked(x: jnp.ndarray, k: int, include_self: bool) -> jnp.ndarray:
    """k-th-NN distance per row with O(CHUNK·N) memory (corpus-scale path)."""
    n = x.shape[0]
    padded = ((n + _CHUNK - 1) // _CHUNK) * _CHUNK
    idx = jnp.minimum(jnp.arange(padded), n - 1)
    sq = jnp.sum(x * x, axis=1)

    def chunk_kth(start):
        rows = jax.lax.dynamic_slice(idx, (start,), (_CHUNK,))
        xc = x[rows]
        d2 = jnp.maximum(sq[rows][:, None] + sq[None, :] - 2.0 * (xc @ x.T), 0.0)
        if not include_self:
            cols = jnp.arange(n)[None, :]
            d2 = jnp.where(cols == rows[:, None], jnp.inf, d2)
        # k-th smallest via top_k on negated distances
        neg_topk, _ = jax.lax.top_k(-d2, k)
        return -neg_topk[:, k - 1]

    starts = jnp.arange(0, padded, _CHUNK)
    kth = jax.lax.map(chunk_kth, starts).reshape(-1)[:n]
    return kth


def k_distance_curve(X: np.ndarray, k: int, include_self: bool = False) -> np.ndarray:
    """Sorted distance to the k-th nearest neighbor.

    ``include_self=True`` reproduces sklearn NearestNeighbors(k).kneighbors
    semantics where each point's first neighbor is itself (so the curve is
    the (k-1)-th non-self distance) — what the reference's auto-eps uses.
    Large inputs take the blocked path (bounded memory) automatically.
    """
    x = jnp.asarray(np.asarray(X, np.float32))
    if x.shape[0] > _DENSE_LIMIT:
        kth = _kth_distance_blocked(x, int(k), bool(include_self))
        return np.sort(np.sqrt(np.asarray(kth)))
    d2 = _pairwise_d2(x)
    if not include_self:
        d2 = d2.at[jnp.arange(d2.shape[0]), jnp.arange(d2.shape[0])].set(jnp.inf)
    kth = jnp.sort(d2, axis=1)[:, k - 1]
    return np.sort(np.sqrt(np.asarray(kth)))


def auto_eps_from_kdistance(
    X: np.ndarray, min_samples: int, quantile: float = 0.98
) -> float:
    """eps at the quantile of the k-distance curve (k = min_samples).

    Exact reference semantics (clustering.py:430-438): the kNN query counts
    the point itself as its first neighbor, and the quantile is the order
    statistic at index round(q·(n−1)) — not an interpolated quantile.
    """
    curve = k_distance_curve(X, max(min_samples, 1), include_self=True)
    idx = int(np.clip(round(quantile * (len(curve) - 1)), 0, len(curve) - 1))
    return float(curve[idx])
