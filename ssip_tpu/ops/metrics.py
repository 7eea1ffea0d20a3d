"""Classification metrics as vectorized jnp ops.

Replaces the reference's sklearn metric calls (reference:
src/training/common.py:307-314, :595-624) with pure-jnp equivalents so that
evaluation can run inside jitted programs on device. Semantics match
sklearn's binary ``precision_recall_fscore_support(average="binary",
zero_division=0)``: undefined ratios are 0.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def _safe_div(num, den):
    return jnp.where(den > 0, num / jnp.where(den > 0, den, 1), 0.0)


def binary_counts(y_true_bin: jnp.ndarray, y_pred_bin: jnp.ndarray):
    """(tp, fp, tn, fn) for {0,1} arrays; works batched on the last axis."""
    y_true_bin = y_true_bin.astype(jnp.int32)
    y_pred_bin = y_pred_bin.astype(jnp.int32)
    tp = jnp.sum((y_true_bin == 1) & (y_pred_bin == 1), axis=-1).astype(jnp.float32)
    fp = jnp.sum((y_true_bin == 0) & (y_pred_bin == 1), axis=-1).astype(jnp.float32)
    tn = jnp.sum((y_true_bin == 0) & (y_pred_bin == 0), axis=-1).astype(jnp.float32)
    fn = jnp.sum((y_true_bin == 1) & (y_pred_bin == 0), axis=-1).astype(jnp.float32)
    return tp, fp, tn, fn


def accuracy(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    n = y_true.shape[-1]
    if n == 0:
        return jnp.float32(0.0)
    return jnp.mean((y_true == y_pred).astype(jnp.float32), axis=-1)


def precision_recall_f1(y_true_bin: jnp.ndarray, y_pred_bin: jnp.ndarray):
    """Binary precision/recall/F1 with zero_division=0 semantics."""
    tp, fp, _tn, fn = binary_counts(y_true_bin, y_pred_bin)
    precision = _safe_div(tp, tp + fp)
    recall = _safe_div(tp, tp + fn)
    f1 = _safe_div(2 * precision * recall, precision + recall)
    return precision, recall, f1


def accuracy_f1(y_true: np.ndarray, y_pred: np.ndarray) -> tuple[float, float]:
    """Host-facing (accuracy, binary-F1) pair.

    Matches reference common.py:307-314 — accuracy over raw labels, F1 of
    class 1 treated as positive.
    """
    y_true = jnp.asarray(np.asarray(y_true))
    y_pred = jnp.asarray(np.asarray(y_pred))
    if y_true.shape[-1] == 0:
        return 0.0, 0.0
    acc = accuracy(y_true, y_pred)
    _, _, f1 = precision_recall_f1((y_true == 1), (y_pred == 1))
    return float(acc), float(f1)


def confusion_matrix_2x2(y_true_bin: jnp.ndarray, y_pred_bin: jnp.ndarray) -> jnp.ndarray:
    """[[tn, fp], [fn, tp]] — sklearn's labels=[0,1] layout."""
    tp, fp, tn, fn = binary_counts(y_true_bin, y_pred_bin)
    return jnp.stack([jnp.stack([tn, fp]), jnp.stack([fn, tp])])


def binary_confusion_metrics(
    y_true: np.ndarray, y_pred: np.ndarray, pos_index: int
) -> Dict[str, float]:
    """Full confusion-derived metric dict.

    Key set matches reference common.py:595-624 so the
    ``results_comparison_detailed.csv`` schema is identical.
    """
    yt = jnp.asarray(np.asarray(y_true) == pos_index, dtype=jnp.int32)
    yp = jnp.asarray(np.asarray(y_pred) == pos_index, dtype=jnp.int32)
    tp, fp, tn, fn = binary_counts(yt, yp)
    tpr = _safe_div(tp, tp + fn)
    tnr = _safe_div(tn, tn + fp)
    fpr = _safe_div(fp, fp + tn)
    fnr = _safe_div(fn, fn + tp)
    precision = _safe_div(tp, tp + fp)
    npv = _safe_div(tn, tn + fn)
    acc = (tp + tn) / jnp.maximum(1.0, tp + tn + fp + fn)
    return {
        "TP": float(tp),
        "FP": float(fp),
        "TN": float(tn),
        "FN": float(fn),
        "TPR": float(tpr),
        "TNR": float(tnr),
        "FPR": float(fpr),
        "FNR": float(fnr),
        "precision": float(precision),
        "recall": float(tpr),
        "accuracy": float(acc),
    }


def roc_curve(y_true_bin: np.ndarray, y_prob: np.ndarray):
    """(fpr, tpr, thresholds) — vectorized over the unique-score axis."""
    y_true_bin = np.asarray(y_true_bin).astype(np.int32)
    y_prob = np.asarray(y_prob, dtype=np.float64)
    order = np.argsort(-y_prob, kind="stable")
    yt = y_true_bin[order]
    ys = y_prob[order]
    tps = np.cumsum(yt)
    fps = np.cumsum(1 - yt)
    # keep last index of each distinct score
    distinct = np.r_[np.nonzero(np.diff(ys))[0], yt.size - 1]
    tps, fps, thr = tps[distinct], fps[distinct], ys[distinct]
    tps = np.r_[0, tps]
    fps = np.r_[0, fps]
    thr = np.r_[np.inf, thr]
    # Single-class degenerate inputs: the absent class's rate is undefined.
    # sklearn returns an all-NaN curve with an explicit warning — a silently
    # clamped all-zero curve would render as a plausible-looking but
    # meaningless ROC figure (review r3).
    p = int(y_true_bin.sum())
    n = int((1 - y_true_bin).sum())
    if p == 0 or n == 0:
        import warnings

        side = "positive" if p == 0 else "negative"
        warnings.warn(
            f"roc_curve: no {side} samples — the corresponding rate is NaN",
            UserWarning,
        )
    fpr = fps / n if n else np.full(fps.shape, np.nan)
    tpr = tps / p if p else np.full(tps.shape, np.nan)
    return fpr, tpr, thr


def average_precision(y_true_bin: np.ndarray, y_prob: np.ndarray) -> float:
    """AP = Σ (Rₙ − Rₙ₋₁)·Pₙ over the PR curve — sklearn
    ``average_precision_score`` semantics (the reference annotates its PR
    legend with it, reference common.py:579-593)."""
    precision, recall, _ = pr_curve(y_true_bin, y_prob)
    # sklearn orientation: recall decreasing with the appended (1, 0) end.
    return float(-np.sum(np.diff(recall) * precision[:-1]))


def pr_curve(y_true_bin: np.ndarray, y_prob: np.ndarray):
    """(precision, recall, thresholds) in sklearn orientation."""
    y_true_bin = np.asarray(y_true_bin).astype(np.int32)
    y_prob = np.asarray(y_prob, dtype=np.float64)
    order = np.argsort(-y_prob, kind="stable")
    yt = y_true_bin[order]
    ys = y_prob[order]
    tps = np.cumsum(yt)
    fps = np.cumsum(1 - yt)
    distinct = np.r_[np.nonzero(np.diff(ys))[0], yt.size - 1]
    tps, fps, thr = tps[distinct], fps[distinct], ys[distinct]
    denom = tps + fps
    precision = np.where(denom > 0, tps / np.maximum(denom, 1), 0.0)
    p = max(int(y_true_bin.sum()), 1)
    recall = tps / p
    # sklearn appends the (precision=1, recall=0) endpoint and reverses.
    precision = np.r_[precision[::-1], 1.0]
    recall = np.r_[recall[::-1], 0.0]
    return precision, recall, thr[::-1]
