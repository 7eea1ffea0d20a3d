"""Decision-layer tests: threshold policies vs hand-computed + sklearn oracles.

Covers semantics of reference common.py:651-746 and threshold_sweep.py:41-70.
"""

import numpy as np
import pytest
from sklearn.metrics import precision_recall_fscore_support

from ssip_tpu.ops.thresholds import (
    confusion_from_threshold,
    find_threshold_for_target_recall,
    select_operating_threshold,
    sweep_thresholds,
)


def _ref_recall(y_true_bin, y_prob, thr):
    y_pred = (y_prob >= thr).astype(int)
    _, recall, _, _ = precision_recall_fscore_support(
        y_true_bin, y_pred, average="binary", zero_division=0
    )
    return recall


class TestFindThresholdForTargetRecall:
    def test_no_positives_returns_half(self):
        assert find_threshold_for_target_recall(np.zeros(4), np.linspace(0, 1, 4), 0.9) == 0.5

    def test_picks_largest_feasible(self):
        y = np.array([1, 1, 0, 0])
        p = np.array([0.9, 0.6, 0.5, 0.1])
        # recall 1.0 requires thr <= 0.6; the largest candidate achieving it is 0.6
        assert find_threshold_for_target_recall(y, p, 1.0) == pytest.approx(0.6)
        # recall >= 0.5 achieved at thr=0.9 already
        assert find_threshold_for_target_recall(y, p, 0.5) == pytest.approx(0.9)

    def test_matches_reference_loop(self, rng):
        for _ in range(20):
            n = 30
            y = (rng.random(n) > 0.5).astype(int)
            if y.sum() == 0:
                y[0] = 1
            p = rng.random(n).round(2)
            target = rng.choice([0.5, 0.8, 0.98, 1.0])
            thr = find_threshold_for_target_recall(y, p, target)
            # reference loop semantics
            cands = np.unique(np.concatenate(([0.0], p)))
            best = cands[0]
            for t in cands[::-1]:
                if _ref_recall(y, p, t) >= target:
                    best = t
                    break
            assert thr == pytest.approx(float(best))


class TestSelectOperatingThreshold:
    def test_no_positives(self):
        thr, info = select_operating_threshold(np.zeros(5), np.linspace(0, 1, 5), 0.9)
        assert thr == 0.5 and info["policy"] == "no_positives"

    def test_constrained_policy(self):
        y = np.array([1, 1, 1, 0, 0, 0])
        p = np.array([0.9, 0.8, 0.7, 0.4, 0.3, 0.1])
        thr, info = select_operating_threshold(y, p, target_recall=1.0, min_precision=0.9)
        assert info["policy"] == "constrained"
        # largest threshold with recall 1.0 and precision 1.0 is 0.7
        assert thr == pytest.approx(0.7)
        assert info["recall"] == pytest.approx(1.0)
        assert info["precision"] == pytest.approx(1.0)

    def test_max_fpr_constraint(self):
        y = np.array([1, 0, 1, 0])
        p = np.array([0.9, 0.85, 0.2, 0.1])
        # recall 1.0 needs thr <= 0.2 → fp=1 (0.85 and 0.1<0.2? no: 0.1 < 0.2) → fpr=0.5
        thr, info = select_operating_threshold(y, p, target_recall=1.0, max_fpr=0.4)
        # infeasible → falls to fbeta
        assert info["policy"] == "fbeta"

    def test_fbeta_fallback_prefers_recall(self):
        y = np.array([1, 1, 0, 0, 0, 0, 0, 0])
        p = np.array([0.9, 0.1, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3])
        thr, info = select_operating_threshold(
            y, p, target_recall=1.0, min_precision=0.99, f_beta=2.0
        )
        assert info["policy"] == "fbeta"
        assert 0 < thr <= 1

    def test_degenerate_all_probs_zero(self):
        y = np.array([1, 0, 1])
        p = np.zeros(3)
        thr, info = select_operating_threshold(y, p, target_recall=0.9)
        # thr 0 gives recall 1, precision 2/3 > 0 → constrained at some thr
        assert info["policy"] in {"constrained", "fbeta", "recall_only", "min_threshold"}
        assert info["recall"] == pytest.approx(1.0)


class TestSweep:
    def test_confusion_row_schema(self):
        y = np.array([1, 1, 0, 0])
        p = np.array([0.9, 0.4, 0.6, 0.1])
        row = confusion_from_threshold(y, p, pos_index=1, thr=0.5)
        assert row["TP"] == 1 and row["FP"] == 1 and row["TN"] == 1 and row["FN"] == 1
        assert row["TPR"] == pytest.approx(0.5)
        assert row["FPR"] == pytest.approx(0.5)
        assert row["precision"] == pytest.approx(0.5)
        assert row["accuracy"] == pytest.approx(0.5)
        assert set(row) == {
            "threshold", "TP", "FP", "TN", "FN", "TPR", "TNR", "FPR",
            "precision", "accuracy",
        }

    def test_sweep_descending_and_complete(self, rng):
        y = (rng.random(40) > 0.6).astype(int)
        p = rng.random(40).round(3)
        rows = sweep_thresholds(y, p, pos_index=1)
        thrs = [r["threshold"] for r in rows]
        assert thrs == sorted(thrs, reverse=True)
        assert thrs[0] == 1.0 and thrs[-1] == 0.0
        # lowest threshold flags everything
        assert rows[-1]["TPR"] == pytest.approx(1.0)

    def test_against_sklearn_counts(self, rng):
        from sklearn.metrics import confusion_matrix

        y = (rng.random(25) > 0.5).astype(int)
        p = rng.random(25)
        for thr in [0.2, 0.5, 0.8]:
            row = confusion_from_threshold(y, p, pos_index=1, thr=thr)
            tn, fp, fn, tp = confusion_matrix(
                y, (p >= thr).astype(int), labels=[0, 1]
            ).ravel()
            assert (row["TP"], row["FP"], row["TN"], row["FN"]) == (tp, fp, tn, fn)


def test_feasibility_exact_on_target_boundary():
    """Recall landing exactly on the target must stay feasible (f64 rates
    from integer counts — f32 rounding of e.g. 19/20 could flip it)."""
    from ssip_tpu.ops.thresholds import select_operating_threshold

    # 20 positives; at thr=0.6 exactly 19 recalled -> recall = 19/20 = 0.95
    y_true = np.r_[np.ones(20, int), np.zeros(20, int)]
    y_prob = np.r_[
        np.full(19, 0.9), [0.1],          # positives: 19 above, 1 below
        np.full(20, 0.05),                # negatives well below
    ]
    thr, meta = select_operating_threshold(y_true, y_prob, target_recall=0.95)
    assert meta["policy"] == "constrained"
    assert meta["recall"] == 19 / 20  # exact f64 value
    assert thr >= 0.5


def test_f64_resolution_thresholds():
    """Probabilities distinct only below f32 resolution must keep distinct
    confusion counts (review r3): with y_prob = [0.5, 0.5+1e-12], threshold
    0.5+1e-12 predicts exactly one positive — in f32 the two values collapse
    and the policy degrades from 'constrained' to 'fbeta' with precision 0.5."""
    y_true = np.array([0, 1])
    y_prob = np.array([0.5, 0.5 + 1e-12], dtype=np.float64)
    thr, info = select_operating_threshold(
        y_true, y_prob, target_recall=1.0, min_precision=1.0
    )
    assert info["policy"] == "constrained"
    assert info["precision"] == 1.0 and info["recall"] == 1.0
    assert thr == 0.5 + 1e-12
