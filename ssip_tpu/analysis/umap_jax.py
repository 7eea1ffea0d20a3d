"""UMAP in JAX — TPU-native manifold embedding.

The environment the reference targets uses the ``umap-learn`` package
(Numba + sparse SGD with per-edge sampling). This is a from-scratch
TPU-native implementation of the same construction (McInnes et al. 2018):

  1. exact kNN graph (one pairwise-distance matrix — N here is small),
  2. per-point (rho, sigma) calibration: rho = nearest-neighbor distance,
     sigma found by vectorized binary search so the smoothed neighbor
     cardinality equals log2(k),
  3. fuzzy simplicial-set symmetrization  P ∪ Pᵀ = P + Pᵀ − P∘Pᵀ,
  4. (a, b) curve parameters fitted to the min_dist membership curve,
  5. embedding optimized by *dense* gradient descent on the UMAP
     cross-entropy — attraction on edge weights, repulsion on their
     complement — as one ``lax.fori_loop`` of matmul-shaped updates with
     the standard linearly-decaying learning rate and per-element gradient
     clipping (±4), PCA-initialized.

Dense optimization replaces umap-learn's stochastic per-edge sampling: at
this scale the full [N,N] gradient is cheaper on the MXU than the sparse
bookkeeping, and deterministic — no negative-sampling noise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ssip_tpu.analysis.pca import fit_pca


def fit_ab(min_dist: float, spread: float = 1.0) -> tuple[float, float]:
    """Fit the (a, b) low-dim membership curve 1/(1 + a·d^{2b}).

    Same least-squares construction as umap-learn's ``find_ab_params``.
    """
    from scipy.optimize import curve_fit

    def curve(x, a, b):
        return 1.0 / (1.0 + a * x ** (2 * b))

    xv = np.linspace(0, spread * 3, 300)
    yv = np.where(
        xv < min_dist, 1.0, np.exp(-(xv - min_dist) / spread)
    )
    (a, b), _ = curve_fit(curve, xv, yv)
    return float(a), float(b)


@partial(jax.jit, static_argnames=("k",))
def _fuzzy_graph(x: jnp.ndarray, k: int):
    """Symmetrized fuzzy simplicial set as a dense [N, N] weight matrix."""
    n = x.shape[0]
    sq = jnp.sum(x * x, axis=1)
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * (x @ x.T), 0.0)
    d = jnp.sqrt(d2)
    d = d.at[jnp.arange(n), jnp.arange(n)].set(jnp.inf)

    knn_d, knn_idx = jax.lax.top_k(-d, k)
    knn_d = -knn_d  # [N, k] ascending-ish distances

    rho = knn_d[:, 0]
    target = jnp.log2(jnp.asarray(float(k)))

    def smooth_count(sigma):
        z = jnp.maximum(knn_d - rho[:, None], 0.0) / sigma[:, None]
        return jnp.sum(jnp.exp(-z), axis=1)

    def body(_, carry):
        lo, hi, sigma = carry
        c = smooth_count(sigma)
        too_many = (c > target)
        new_hi = jnp.where(too_many, sigma, hi)
        new_lo = jnp.where(too_many, lo, sigma)
        new_sigma = jnp.where(
            jnp.isinf(new_hi), new_lo * 2.0, (new_lo + new_hi) / 2.0
        )
        return new_lo, new_hi, new_sigma

    lo = jnp.full((n,), 1e-8)
    hi = jnp.full((n,), jnp.inf)
    sigma = jnp.ones((n,))
    _, _, sigma = jax.lax.fori_loop(0, 64, body, (lo, hi, sigma))

    weights = jnp.exp(
        -jnp.maximum(knn_d - rho[:, None], 0.0) / jnp.maximum(sigma, 1e-8)[:, None]
    )  # [N, k]
    p = jnp.zeros((n, n))
    rows = jnp.repeat(jnp.arange(n), k)
    p = p.at[rows, knn_idx.reshape(-1)].set(weights.reshape(-1))
    return p + p.T - p * p.T


@partial(jax.jit, static_argnames=("n_epochs", "k"))
def _optimize(
    p: jnp.ndarray, y0: jnp.ndarray, a: float, b: float, n_epochs: int, k: int
):
    n = y0.shape[0]
    eye = jnp.eye(n, dtype=bool)
    rep_base = jnp.where(eye, 0.0, jnp.maximum(1.0 - p, 0.0))
    # The dense step sums ~k per-edge updates umap-learn would apply
    # sequentially — scale the rate down by k to keep per-update magnitude
    # equivalent; repulsion mass matches negative_sample_rate (5) negatives
    # per positive edge, spread over the n-row complement.
    lr0 = 0.5 / k
    rep_scale = 5.0 * k / n

    def step(i, y):
        alpha = lr0 * (1.0 - i / n_epochs)
        diff = y[:, None, :] - y[None, :, :]  # [N, N, 2]
        d2 = jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-10)
        pow_term = a * d2**b
        attract_coeff = jnp.where(
            eye, 0.0, p * (-2.0 * a * b * d2 ** (b - 1.0)) / (1.0 + pow_term)
        )
        repulse_coeff = rep_base * rep_scale * (2.0 * b) / (
            (0.001 + d2) * (1.0 + pow_term)
        )
        coeff = attract_coeff + repulse_coeff  # [N, N]
        grad = jnp.clip(coeff[..., None] * diff, -4.0, 4.0).sum(axis=1)
        return y - alpha * grad

    return jax.lax.fori_loop(0, n_epochs, step, y0)


def umap(
    X: np.ndarray,
    n_neighbors: int = 15,
    min_dist: float = 0.1,
    n_components: int = 2,
    n_epochs: int = 200,
    seed: int = 42,
    max_points: int = 20_000,
) -> np.ndarray:
    """2-D UMAP embedding. Deterministic (PCA init, dense optimization).

    Fails fast above ``max_points`` — the dense optimizer holds [N, N]
    (and [N, N, 2]) tensors, a silent OOM wall at corpus scale (subsample
    for visualization instead; see analysis/blocked.py).
    """
    from ssip_tpu.analysis.blocked import check_embedding_cap

    X = np.asarray(X, np.float32)
    n = X.shape[0]
    check_embedding_cap(n, max_points, "UMAP")
    k = min(n_neighbors, n - 1)
    a, b = fit_ab(min_dist)

    p = _fuzzy_graph(jnp.asarray(X), k)

    pca_model = fit_pca(X)
    y0 = pca_model.transform(X, n_components).astype(np.float32)
    y0 = y0 / max(y0.std(), 1e-12) * 10.0  # spread init like spectral-scaled

    y = _optimize(p, jnp.asarray(y0), a, b, n_epochs, k)
    return np.asarray(y)
