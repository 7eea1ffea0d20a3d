"""PCA via jnp SVD with sklearn-compatible conventions.

Replaces the reference's sklearn ``PCA(svd_solver="full")`` (reference
clustering.py:200-248): center → thin SVD on device → sklearn's
``svd_flip`` sign convention (largest-|u| entry per component positive) so
projections match sklearn's up to float32 effects. Component count at a
target explained-variance ratio = first prefix whose cumulative ratio
reaches the target.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass
class PCAModel:
    mean: np.ndarray  # [D]
    components: np.ndarray  # [K, D] rows = principal axes
    explained_variance: np.ndarray  # [K]
    explained_variance_ratio: np.ndarray  # [K]

    def transform(self, X: np.ndarray, n_components: int | None = None) -> np.ndarray:
        comps = self.components if n_components is None else self.components[:n_components]
        return np.asarray(
            (jnp.asarray(X, jnp.float32) - jnp.asarray(self.mean))
            @ jnp.asarray(comps).T,
            dtype=np.float32,
        )


def fit_pca(X: np.ndarray) -> PCAModel:
    x = jnp.asarray(X, jnp.float32)
    n = x.shape[0]
    mean = jnp.mean(x, axis=0)
    x0 = x - mean
    u, s, vt = jnp.linalg.svd(x0, full_matrices=False)

    # sklearn svd_flip (v-based, sklearn ≥1.5): each row of Vt gets its
    # max-|.| entry made positive.
    max_cols = jnp.argmax(jnp.abs(vt), axis=1)
    signs = jnp.sign(vt[jnp.arange(vt.shape[0]), max_cols])
    signs = jnp.where(signs == 0, 1.0, signs)
    vt = vt * signs[:, None]

    explained = (s**2) / (n - 1)
    ratio = explained / jnp.sum(explained)
    return PCAModel(
        mean=np.asarray(mean),
        components=np.asarray(vt),
        explained_variance=np.asarray(explained),
        explained_variance_ratio=np.asarray(ratio),
    )


def components_for_variance(model: PCAModel, target: float) -> int:
    """Smallest K with cumulative explained-variance ratio ≥ target."""
    cumulative = np.cumsum(model.explained_variance_ratio)
    k = int(np.searchsorted(cumulative, target) + 1)
    return min(k, len(cumulative))
