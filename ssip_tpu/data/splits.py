"""Deterministic stratified splits + balanced resampling (host-side).

The reference uses sklearn's two-stage ``train_test_split`` (60/20/20,
stratified, seed 42 — reference common.py:197-224) and torch's
``WeightedRandomSampler`` (common.py:227-246). We keep sklearn for the split
so the *exact same indices* fall out for a given seed (split indices are a
persisted artifact consumed by threshold_sweep), and replace the torch
sampler with a seeded numpy draw of identical distributional semantics
(per-sample weight 1/class-count, with replacement, n = len(dataset);
uniform fallback when only one class is present).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np
from sklearn.model_selection import train_test_split

from ssip_tpu.runtime.prng import host_rng


def stratified_split(
    targets: Sequence[int], val_size: float, test_size: float, seed: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(train, val, test) index arrays; exact index parity with the reference."""
    indices = np.arange(len(targets))
    train_idx, temp_idx, _, temp_targets = train_test_split(
        indices,
        list(targets),
        test_size=val_size + test_size,
        random_state=seed,
        stratify=list(targets),
    )
    relative_test = test_size / (val_size + test_size)
    val_idx, test_idx = train_test_split(
        temp_idx,
        test_size=relative_test,
        random_state=seed,
        stratify=temp_targets,
    )
    return np.asarray(train_idx), np.asarray(val_idx), np.asarray(test_idx)


def split_dict(
    targets: Sequence[int], val_size: float, test_size: float, seed: int
) -> Dict[str, np.ndarray]:
    train, val, test = stratified_split(targets, val_size, test_size, seed)
    return {"train": train, "val": val, "test": test}


def stratified_kfold_indices(
    targets: Sequence[int], k: int, seed: int
) -> list[Tuple[np.ndarray, np.ndarray]]:
    """K stratified folds: [(train_idx, val_idx)] covering every index once.

    Per-class round-robin over a seeded shuffle, sklearn-StratifiedKFold-
    style (each class's samples spread as evenly as possible across folds).
    TPU extra — the reference has no cross-validation; used by the
    ``--cv-folds`` fan-out, where each fold trains as one vmapped lane.
    """
    targets = np.asarray(targets, dtype=np.int64)
    if not 2 <= k <= len(targets):
        raise ValueError(f"cv folds must be in [2, n_samples], got {k}")
    max_class = int(np.bincount(targets).max())
    if k > max_class:
        # with per-class round-robin, folds beyond the largest class count
        # would have ZERO validation samples (NaN metrics downstream)
        raise ValueError(
            f"cv folds ({k}) exceeds the largest class count ({max_class}); "
            "every fold needs at least one validation sample"
        )
    rng = host_rng(seed, "kfold")
    fold_of = np.empty(len(targets), dtype=np.int64)
    for cls in np.unique(targets):
        idx = np.flatnonzero(targets == cls)
        idx = idx[rng.permutation(len(idx))]
        fold_of[idx] = np.arange(len(idx)) % k
    all_idx = np.arange(len(targets))
    return [
        (all_idx[fold_of != f], all_idx[fold_of == f]) for f in range(k)
    ]


def balanced_sample_weights(labels: Sequence[int]) -> np.ndarray:
    """Per-sample weights 1/class-count; uniform if fewer than 2 classes."""
    labels = np.asarray(labels, dtype=np.int64)
    counts = np.bincount(labels)
    if len(np.nonzero(counts)[0]) < 2:
        return np.ones(len(labels), dtype=np.float64)
    weights = 1.0 / counts
    return weights[labels].astype(np.float64)


def balanced_epoch_indices(
    labels: Sequence[int], seed: int, epoch: int, num_samples: int | None = None
) -> np.ndarray:
    """One epoch's balanced resample (with replacement), deterministic."""
    labels = np.asarray(labels, dtype=np.int64)
    n = int(num_samples) if num_samples is not None else len(labels)
    weights = balanced_sample_weights(labels)
    p = weights / weights.sum()
    rng = host_rng(seed, f"balanced_sampler/{epoch}")
    return rng.choice(len(labels), size=n, replace=True, p=p)
