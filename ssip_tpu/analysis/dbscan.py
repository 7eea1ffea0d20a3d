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
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ssip_tpu.analysis.blocked import CHUNK as _CHUNK, DENSE_LIMIT as _DENSE_LIMIT


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


def _neighbor_lists_dense(x: jnp.ndarray, eps: float) -> List[np.ndarray]:
    """Per-point radius-neighbor index lists from the full [N, N] matrix."""
    adjacency = np.asarray(_pairwise_d2(x)) <= float(eps) ** 2  # includes self
    return [np.nonzero(row)[0] for row in adjacency]


def _neighbor_lists_blocked(x: jnp.ndarray, eps: float) -> List[np.ndarray]:
    """Corpus-scale radius query: one [CHUNK, N] distance tile at a time.

    Peak memory is O(CHUNK·N) plus the (data-dependent, inherently
    necessary) total neighbor-list storage — the [N, N] matrix is never
    materialized on device or host.
    """
    n = int(x.shape[0])
    sq = jnp.sum(x * x, axis=1)
    eps2 = jnp.asarray(float(eps) ** 2, x.dtype)

    @jax.jit
    def chunk_adjacency(xc, sqc):
        d2 = jnp.maximum(sqc[:, None] + sq[None, :] - 2.0 * (xc @ x.T), 0.0)
        return d2 <= eps2

    neighbors: List[np.ndarray] = []
    padded = ((n + _CHUNK - 1) // _CHUNK) * _CHUNK
    for start in range(0, padded, _CHUNK):
        rows = np.minimum(np.arange(start, start + _CHUNK), n - 1)
        mask = np.asarray(chunk_adjacency(x[jnp.asarray(rows)], sq[jnp.asarray(rows)]))
        take = min(_CHUNK, n - start)
        neighbors.extend(np.nonzero(row)[0] for row in mask[:take])
    return neighbors


def dbscan(X: np.ndarray, eps: float, min_samples: int) -> DBSCANResult:
    x = jnp.asarray(np.asarray(X, np.float32))
    n = int(x.shape[0])
    if n > _DENSE_LIMIT:
        neighbors = _neighbor_lists_blocked(x, eps)
    else:
        neighbors = _neighbor_lists_dense(x, eps)
    core = np.fromiter(
        (len(nb) >= min_samples for nb in neighbors), bool, count=n
    )

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
            for nb in neighbors[j]:
                if labels[nb] == -1:
                    labels[nb] = cluster
                    if core[nb]:
                        queue.append(nb)
        cluster += 1

    noise_rate = float((labels == -1).mean()) if n else 0.0
    return DBSCANResult(
        labels=labels, core_mask=core, n_clusters=cluster, noise_rate=noise_rate
    )


# _DENSE_LIMIT/_CHUNK come from ssip_tpu.analysis.blocked — the shared
# corpus-scale policy for every dense analysis kernel.


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
