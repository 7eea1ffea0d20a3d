"""jnp metric ops vs sklearn oracles."""

import numpy as np
import pytest
from sklearn.metrics import (
    accuracy_score,
    confusion_matrix,
    precision_recall_curve,
    precision_recall_fscore_support,
    roc_curve as sk_roc_curve,
)

from ssip_tpu.ops import metrics as M


def test_accuracy_f1_matches_sklearn(rng):
    for _ in range(10):
        y = rng.integers(0, 2, 30)
        yp = rng.integers(0, 2, 30)
        acc, f1 = M.accuracy_f1(y, yp)
        assert acc == pytest.approx(accuracy_score(y, yp))
        _, _, ref_f1, _ = precision_recall_fscore_support(
            y, yp, average="binary", zero_division=0
        )
        assert f1 == pytest.approx(float(ref_f1), abs=1e-6)


def test_accuracy_f1_empty():
    assert M.accuracy_f1(np.array([]), np.array([])) == (0.0, 0.0)


def test_binary_confusion_metrics(rng):
    y = rng.integers(0, 2, 40)
    yp = rng.integers(0, 2, 40)
    out = M.binary_confusion_metrics(y, yp, pos_index=1)
    tn, fp, fn, tp = confusion_matrix(y, yp, labels=[0, 1]).ravel()
    assert (out["TP"], out["FP"], out["TN"], out["FN"]) == (tp, fp, tn, fn)
    assert out["recall"] == out["TPR"]
    # pos_index=0 flips the positive class
    out0 = M.binary_confusion_metrics(y, yp, pos_index=0)
    assert out0["TP"] == tn


def test_roc_curve_matches_sklearn(rng):
    y = (rng.random(50) > 0.5).astype(int)
    p = rng.random(50).round(2)
    fpr, tpr, _ = M.roc_curve(y, p)
    sk_fpr, sk_tpr, _ = sk_roc_curve(y, p, drop_intermediate=False)
    np.testing.assert_allclose(fpr, sk_fpr, atol=1e-12)
    np.testing.assert_allclose(tpr, sk_tpr, atol=1e-12)


def test_pr_curve_matches_sklearn(rng):
    y = (rng.random(50) > 0.5).astype(int)
    p = rng.random(50).round(2)
    prec, rec, _ = M.pr_curve(y, p)
    sk_prec, sk_rec, _ = precision_recall_curve(y, p)
    np.testing.assert_allclose(prec, sk_prec, atol=1e-12)
    np.testing.assert_allclose(rec, sk_rec, atol=1e-12)


def test_average_precision_matches_sklearn(rng):
    from sklearn.metrics import average_precision_score

    y = (rng.random(60) > 0.4).astype(int)
    p = rng.random(60).round(2)
    assert abs(M.average_precision(y, p) - average_precision_score(y, p)) < 1e-12


def test_roc_curve_single_class_matches_sklearn():
    """Degenerate one-class inputs: the absent class's rate is all-NaN with
    a warning — sklearn semantics — never a plausible-looking all-zero curve
    (review r3)."""
    import warnings

    p = np.array([0.1, 0.5, 0.9])
    for y in (np.zeros(3, np.int32), np.ones(3, np.int32)):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            fpr, tpr, _ = M.roc_curve(y, p)
            sk_fpr, sk_tpr, _ = sk_roc_curve(y, p, drop_intermediate=False)
        np.testing.assert_array_equal(np.isnan(fpr), np.isnan(sk_fpr))
        np.testing.assert_array_equal(np.isnan(tpr), np.isnan(sk_tpr))
        np.testing.assert_allclose(
            np.nan_to_num(fpr, nan=-1), np.nan_to_num(sk_fpr, nan=-1)
        )
        np.testing.assert_allclose(
            np.nan_to_num(tpr, nan=-1), np.nan_to_num(sk_tpr, nan=-1)
        )
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            M.roc_curve(y, p)
        assert any("NaN" in str(w.message) for w in rec)
