"""Model evaluation with optional binary thresholding.

Semantics of the reference's ``evaluate_model`` (reference common.py:439-506):
positive-class softmax probabilities; predictions by argmax or, for binary
problems with a threshold, by ``prob >= thr`` mapped back onto class indices;
metrics binarized w.r.t. the positive class when given.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from ssip_tpu.ops.metrics import accuracy, precision_recall_f1
from ssip_tpu.train.engine import DeviceDataset, TrainState, run_eval_epoch


def evaluate_model(
    state_or_vars,
    dataset: DeviceDataset,
    batch_size: int,
    pos_index: Optional[int] = None,
    threshold: Optional[float] = None,
    apply_fn=None,
    mesh=None,
    fsdp: bool = False,
) -> Tuple[Dict[str, float], np.ndarray, np.ndarray, np.ndarray]:
    """(metrics, y_true, y_pred, y_prob_positive)."""
    _, y_true, y_pred_argmax, probs_full = run_eval_epoch(
        state_or_vars, dataset, batch_size, apply_fn=apply_fn, mesh=mesh,
        fsdp=fsdp,
    )
    num_classes = probs_full.shape[1] if probs_full.ndim == 2 else 2

    pos_col = (
        pos_index
        if pos_index is not None
        else (1 if num_classes > 1 else 0)
    )
    y_prob = probs_full[:, pos_col]

    if threshold is None or num_classes != 2:
        y_pred = y_pred_argmax
    else:
        neg_col = 1 - pos_col
        y_pred = np.where(y_prob >= threshold, pos_col, neg_col)

    # Binarize w.r.t. pos_index when given; otherwise metrics use the raw
    # labels with class 1 as the binary positive (reference :486-497).
    if pos_index is not None:
        yt = (y_true == pos_index).astype(int)
        yp = (y_pred == pos_index).astype(int)
    else:
        yt, yp = y_true, y_pred

    import jax.numpy as jnp

    acc = float(accuracy(jnp.asarray(yt), jnp.asarray(yp)))
    precision, recall, f1 = precision_recall_f1(
        jnp.asarray(yt == 1), jnp.asarray(yp == 1)
    )
    metrics = {
        "accuracy": acc,
        "precision": float(precision),
        "recall": float(recall),
        "f1": float(f1),
    }
    return metrics, y_true, y_pred, y_prob
