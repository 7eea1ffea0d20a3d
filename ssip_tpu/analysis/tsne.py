"""Exact t-SNE in JAX — the 2-D visualization embedding.

TPU-native replacement for sklearn's TSNE (reference clustering.py:251-276;
visualization-only, so algorithmic fidelity to the t-SNE objective matters,
bitwise parity with sklearn's Barnes-Hut implementation does not). The whole
algorithm is dense linear algebra at this scale ([N≤~5k]) and maps cleanly
onto the chip:

  - per-point conditional P via vectorized binary search over log-sigma to
    hit the target perplexity (all points in parallel),
  - symmetrized joint P with early exaggeration (12× for the first quarter
    of the schedule),
  - gradient descent with momentum (0.5 → 0.8 at the exaggeration switch)
    and per-parameter gains, the classic vdM schedule, as one
    ``lax.fori_loop``.

PCA initialization (scaled to std 1e-4), matching the reference's
``init="pca"`` configuration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ssip_tpu.analysis.pca import fit_pca


def _conditional_p(d2: jnp.ndarray, perplexity: float, iters: int = 50) -> jnp.ndarray:
    """Row-stochastic conditional P matching target perplexity per row."""
    n = d2.shape[0]
    target = jnp.log(perplexity)
    eye = jnp.eye(n, dtype=bool)
    d2 = jnp.where(eye, jnp.inf, d2)

    def entropy_and_p(beta):
        # beta: [N,1] precision; returns (H [N], P [N,N] row-stochastic)
        logits = -d2 * beta
        logits = logits - jnp.max(jnp.where(eye, -jnp.inf, logits), axis=1, keepdims=True)
        p = jnp.where(eye, 0.0, jnp.exp(logits))
        sum_p = jnp.sum(p, axis=1, keepdims=True)
        p = p / jnp.maximum(sum_p, 1e-30)
        h = -jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0), axis=1)
        return h, p

    def body(_, carry):
        lo, hi, beta = carry
        h, _ = entropy_and_p(beta)
        too_high = (h > target)[:, None]  # entropy too high → increase beta
        new_lo = jnp.where(too_high, beta, lo)
        new_hi = jnp.where(too_high, hi, beta)
        new_beta = jnp.where(
            jnp.isinf(new_hi), new_lo * 2.0, (new_lo + new_hi) / 2.0
        )
        return new_lo, new_hi, new_beta

    lo = jnp.zeros((n, 1))
    hi = jnp.full((n, 1), jnp.inf)
    beta = jnp.ones((n, 1))
    _, _, beta = jax.lax.fori_loop(0, iters, body, (lo, hi, beta))
    _, p = entropy_and_p(beta)
    return p


@partial(jax.jit, static_argnames=("n_iter", "exaggeration_iter"))
def _optimize(
    p_joint: jnp.ndarray,
    y0: jnp.ndarray,
    learning_rate: jnp.ndarray,
    n_iter: int,
    exaggeration_iter: int,
    early_exaggeration: float = 12.0,
):
    n = y0.shape[0]
    eye = jnp.eye(n, dtype=bool)

    def grad(y, p):
        sq = jnp.sum(y * y, axis=1)
        d2 = sq[:, None] + sq[None, :] - 2.0 * (y @ y.T)
        num = 1.0 / (1.0 + d2)
        num = jnp.where(eye, 0.0, num)
        q = num / jnp.maximum(jnp.sum(num), 1e-30)
        pq = (p - q) * num  # [N,N]
        return 4.0 * (jnp.diag(jnp.sum(pq, axis=1)) - pq) @ y

    def step(i, carry):
        y, vel, gains = carry
        p = jnp.where(i < exaggeration_iter, p_joint * early_exaggeration, p_joint)
        momentum = jnp.where(i < exaggeration_iter, 0.5, 0.8)
        g = grad(y, p)
        same_sign = jnp.sign(g) == jnp.sign(vel)
        gains = jnp.clip(
            jnp.where(same_sign, gains * 0.8, gains + 0.2), 0.01, None
        )
        vel = momentum * vel - learning_rate * gains * g
        y = y + vel
        y = y - jnp.mean(y, axis=0, keepdims=True)
        return y, vel, gains

    y, _, _ = jax.lax.fori_loop(
        0, n_iter, step, (y0, jnp.zeros_like(y0), jnp.ones_like(y0))
    )
    return y


def tsne(
    X: np.ndarray,
    perplexity: float = 30.0,
    n_components: int = 2,
    n_iter: int = 1000,
    seed: int = 42,
    max_points: int = 20_000,
) -> np.ndarray:
    """2-D embedding of X. Deterministic (PCA init).

    Fails fast above ``max_points`` — the exact formulation holds several
    [N, N] float matrices, a silent OOM wall at corpus scale (subsample
    for visualization instead; see analysis/blocked.py).
    """
    from ssip_tpu.analysis.blocked import check_embedding_cap

    X = np.asarray(X, np.float32)
    n = X.shape[0]
    check_embedding_cap(n, max_points, "t-SNE")
    perplexity = min(perplexity, (n - 1) / 3.0)  # sklearn guard

    x = jnp.asarray(X)
    sq = jnp.sum(x * x, axis=1)
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * (x @ x.T), 0.0)

    p_cond = _conditional_p(d2, perplexity)
    p_joint = (p_cond + p_cond.T) / (2.0 * n)
    p_joint = jnp.maximum(p_joint, 1e-12)

    pca_model = fit_pca(X)
    y0 = pca_model.transform(X, n_components).astype(np.float32)
    y0 = y0 / max(y0[:, 0].std(), 1e-12) * 1e-4  # sklearn pca-init scaling

    # sklearn's learning_rate="auto": max(N / early_exaggeration / 4, 50)
    lr = max(n / 12.0 / 4.0, 50.0)
    y = _optimize(
        p_joint,
        jnp.asarray(y0),
        jnp.asarray(lr, jnp.float32),
        n_iter=n_iter,
        exaggeration_iter=250,
    )
    return np.asarray(y)


def kl_divergence(X: np.ndarray, Y: np.ndarray, perplexity: float) -> float:
    """KL(P||Q) of an embedding — the t-SNE objective, for diagnostics."""
    X = np.asarray(X, np.float32)
    n = X.shape[0]
    x = jnp.asarray(X)
    sq = jnp.sum(x * x, axis=1)
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * (x @ x.T), 0.0)
    p = _conditional_p(d2, min(perplexity, (n - 1) / 3.0))
    p = (p + p.T) / (2.0 * n)
    p = jnp.maximum(p, 1e-12)

    y = jnp.asarray(np.asarray(Y, np.float32))
    sqy = jnp.sum(y * y, axis=1)
    d2y = sqy[:, None] + sqy[None, :] - 2.0 * (y @ y.T)
    num = 1.0 / (1.0 + d2y)
    num = num.at[jnp.arange(n), jnp.arange(n)].set(0.0)
    q = jnp.maximum(num / jnp.sum(num), 1e-12)
    return float(jnp.sum(p * (jnp.log(p) - jnp.log(q))))
