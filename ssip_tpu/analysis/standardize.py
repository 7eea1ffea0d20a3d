"""Feature standardization: z-score embeddings into the clustering bundle.

Semantics: reference src/standardize_features.py:12-63 — sklearn
StandardScaler replaced by jnp mean/std (biased std, ddof=0, matching
StandardScaler), bundling features + alignment metadata into
``standardized_features.npz`` with the exact key set the clustering stage
requires (features, paths, is_labeled, labels, scaler_mean, scaler_scale).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import jax.numpy as jnp
import numpy as np
import pandas as pd

from ssip_tpu.runtime.logging import get_logger

LOGGER = get_logger(__name__)


def fit_scaler(features: np.ndarray) -> Dict[str, np.ndarray]:
    x = jnp.asarray(features, jnp.float32)
    mean = jnp.mean(x, axis=0)
    std = jnp.std(x, axis=0)  # ddof=0 — StandardScaler's scale_
    # StandardScaler maps zero-variance dims to scale 1.0
    scale = jnp.where(std == 0.0, 1.0, std)
    return {"mean": np.asarray(mean), "scale": np.asarray(scale)}


def transform(features: np.ndarray, scaler: Dict[str, np.ndarray]) -> np.ndarray:
    x = jnp.asarray(features, jnp.float32)
    return np.asarray(
        (x - jnp.asarray(scaler["mean"])) / jnp.asarray(scaler["scale"]),
        dtype=np.float32,
    )


def standardize_embeddings(
    embeddings_path: Path, csv_path: Path, output_path: Path
) -> None:
    embeddings_path, csv_path = Path(embeddings_path), Path(csv_path)
    if not embeddings_path.exists():
        raise FileNotFoundError(f"Embeddings file not found: {embeddings_path}")
    if not csv_path.exists():
        raise FileNotFoundError(f"Embeddings CSV not found: {csv_path}")

    E = np.load(embeddings_path)
    if E.ndim != 2:
        raise ValueError(f"Embeddings must be 2D [N, D], got shape {E.shape}")

    df = pd.read_csv(csv_path)
    required = {"index", "path", "bucket", "label"}
    missing = required - set(df.columns)
    if missing:
        raise KeyError(f"Embeddings CSV missing columns: {', '.join(sorted(missing))}")
    df = df.sort_values("index").reset_index(drop=True)
    if len(df) != E.shape[0]:
        raise ValueError(
            f"Row count mismatch between CSV ({len(df)}) and embeddings ({E.shape[0]})"
        )

    scaler = fit_scaler(E.astype(np.float32))
    Z = transform(E.astype(np.float32), scaler)

    paths = df["path"].astype(str).to_numpy(dtype=np.str_)
    is_labeled = (df["bucket"].astype(str) == "labeled").to_numpy()
    labels_series = df["label"].fillna("").astype(str).where(is_labeled, "")
    labels = labels_series.to_numpy(dtype=np.str_)

    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        output_path,
        features=Z.astype(np.float32),
        paths=paths,
        is_labeled=is_labeled,
        labels=labels,
        scaler_mean=scaler["mean"].astype(np.float32),
        scaler_scale=scaler["scale"].astype(np.float32),
    )
    LOGGER.info(
        "Wrote standardized bundle: %s (N=%d, D=%d)", output_path, Z.shape[0], Z.shape[1]
    )
