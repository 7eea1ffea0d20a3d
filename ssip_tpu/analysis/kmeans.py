"""K-Means: k-means++ seeding + jitted Lloyd iterations, n_init fan-out.

TPU-native replacement for sklearn KMeans (reference clustering.py:340-373):
each Lloyd sweep is two matmul-shaped reductions ([N,K] distance matrix and
one-hot centroid accumulation) inside ``lax.while_loop`` with sklearn's
convergence rule (center shift² ≤ tol·mean-feature-variance, max_iter 300);
``n_init`` restarts are vmapped so all restarts run as one batched program.
Empty clusters are re-seeded with the points farthest from their assigned
centers (sklearn's relocation strategy, simplified).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssip_tpu.runtime.prng import host_rng


@dataclass
class KMeansResult:
    labels: np.ndarray  # [N]
    centers: np.ndarray  # [K, D]
    inertia: float
    n_iter: int


def _plus_plus_init(
    X: np.ndarray, k: int, rng: np.random.Generator
) -> np.ndarray:
    """k-means++ seeding with sklearn's local-trials refinement (host)."""
    n = X.shape[0]
    n_local_trials = 2 + int(np.log(k)) if k > 1 else 1
    centers = np.empty((k, X.shape[1]), X.dtype)
    first = int(rng.integers(n))
    centers[0] = X[first]
    closest = np.sum((X - centers[0]) ** 2, axis=1)
    for c in range(1, k):
        total = closest.sum()
        if total == 0:
            centers[c:] = X[rng.integers(n, size=k - c)]
            break
        candidates = rng.choice(n, size=n_local_trials, p=closest / total)
        cand_dist = np.sum((X[None, :, :] - X[candidates, None, :]) ** 2, axis=2)
        cand_closest = np.minimum(closest[None, :], cand_dist)
        best = int(np.argmin(cand_closest.sum(axis=1)))
        centers[c] = X[candidates[best]]
        closest = cand_closest[best]
    return centers


@partial(jax.jit, static_argnames=("max_iter",))
def _lloyd(X: jnp.ndarray, init_centers: jnp.ndarray, tol: jnp.ndarray, max_iter: int):
    """One restart of Lloyd's; returns (centers, labels, inertia, n_iter)."""
    k = init_centers.shape[0]
    x_sq = jnp.sum(X * X, axis=1)

    def assign(centers):
        c_sq = jnp.sum(centers * centers, axis=1)
        d2 = x_sq[:, None] + c_sq[None, :] - 2.0 * (X @ centers.T)
        labels = jnp.argmin(d2, axis=1)
        return labels, jnp.maximum(d2[jnp.arange(X.shape[0]), labels], 0.0)

    def update(centers, labels, point_d2):
        one_hot = jax.nn.one_hot(labels, k, dtype=X.dtype)  # [N, K]
        counts = jnp.sum(one_hot, axis=0)
        sums = one_hot.T @ X  # [K, D]
        new_centers = sums / jnp.maximum(counts, 1.0)[:, None]
        # relocate empty clusters to the farthest points
        order = jnp.argsort(-point_d2)
        farthest = X[order[:k]]
        new_centers = jnp.where((counts == 0)[:, None], farthest, new_centers)
        return new_centers

    def cond(carry):
        _, _, shift2, it, _ = carry
        return (shift2 > tol) & (it < max_iter)

    def body(carry):
        centers, _, _, it, _ = carry
        labels, point_d2 = assign(centers)
        new_centers = update(centers, labels, point_d2)
        shift2 = jnp.sum((new_centers - centers) ** 2)
        return new_centers, labels, shift2, it + 1, point_d2

    labels0, d20 = assign(init_centers)
    carry = (init_centers, labels0, jnp.asarray(jnp.inf, X.dtype), jnp.asarray(0), d20)
    centers, _, _, n_iter, _ = jax.lax.while_loop(cond, body, carry)
    labels, point_d2 = assign(centers)
    inertia = jnp.sum(point_d2)
    return centers, labels, inertia, n_iter


_lloyd_batched = jax.jit(
    jax.vmap(_lloyd, in_axes=(None, 0, None, None)), static_argnames=("max_iter",)
)


def kmeans(
    X: np.ndarray,
    n_clusters: int,
    n_init: int = 10,
    seed: int = 42,
    max_iter: int = 300,
    tol: float = 1e-4,
) -> KMeansResult:
    """Best-of-n_init K-Means; deterministic in (data, seed)."""
    X = np.asarray(X, np.float32)
    rng = host_rng(seed, f"kmeans/k={n_clusters}")
    inits = np.stack([_plus_plus_init(X, n_clusters, rng) for _ in range(n_init)])

    # sklearn scales tol by the mean per-feature variance of the data
    scaled_tol = float(tol * np.mean(np.var(X, axis=0)))
    xd = jnp.asarray(X)
    centers, labels, inertia, n_iter = _lloyd_batched(
        xd, jnp.asarray(inits), jnp.asarray(scaled_tol, jnp.float32), max_iter
    )
    best = int(np.argmin(np.asarray(inertia)))
    return KMeansResult(
        labels=np.asarray(labels[best], np.int64),
        centers=np.asarray(centers[best]),
        inertia=float(inertia[best]),
        n_iter=int(n_iter[best]),
    )
