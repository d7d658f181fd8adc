"""Metric tests vs hand-computed oracles (reference: `python/hetu/metrics.py`
tested implicitly via run scripts; here explicit)."""

import numpy as np

from herald_tpu.utils import metrics as M


def test_auc_perfect_and_random():
    y = np.array([0, 0, 1, 1])
    assert M.auc_score(y, np.array([0.1, 0.2, 0.8, 0.9])) == 1.0
    assert M.auc_score(y, np.array([0.9, 0.8, 0.2, 0.1])) == 0.0
    assert M.auc_score(y, np.array([0.5, 0.5, 0.5, 0.5])) == 0.5


def test_auc_matches_pairwise_definition():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, 200)
    s = rng.standard_normal(200)
    pos = s[y == 1]
    neg = s[y == 0]
    pairs = (pos[:, None] > neg[None, :]).mean() + \
        0.5 * (pos[:, None] == neg[None, :]).mean()
    assert abs(M.auc_score(y, s) - pairs) < 1e-9


def test_accuracy_confusion_f1():
    y = np.array([1, 1, 0, 0])
    s = np.array([0.9, 0.2, 0.8, 0.1])
    assert M.accuracy(y, s) == 0.5
    cm = M.confusion_matrix(y, s)
    assert cm.tolist() == [[1, 1], [1, 1]]
    p, r, f1 = M.precision_recall_f1(y, s)
    assert p == 0.5 and r == 0.5 and f1 == 0.5


def test_roc_pr_curves_and_riemann_auc():
    """roc_pr_curve/auc_riemann mirror the reference discretized pair
    (`python/hetu/metrics.py:120-154`; cross-validated against it at
    build time: ROC 0.676913 on the seed-0 fixture below)."""
    from herald_tpu.utils.metrics import (auc_riemann, auc_score,
                                          roc_pr_curve)
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, 500).astype(float)
    p = np.clip(rng.normal(0.5 + 0.2 * (y - 0.5), 0.25), 0, 1)
    np.testing.assert_allclose(auc_riemann(y, p, curve="ROC"),
                               0.676913, atol=1e-5)
    # discretized ROC approximates the exact rank statistic
    assert abs(auc_riemann(y, p) - auc_score(y, p)) < 5e-3
    x, r = roc_pr_curve(y, p, curve="ROC")
    assert x.shape == r.shape == (200,)
    # threshold -eps classifies everything positive -> (1, 1); 1+eps ->
    # (~0, ~0); monotone non-increasing in threshold
    np.testing.assert_allclose([x[0], r[0]], [1.0, 1.0], atol=1e-5)
    assert x[-1] < 1e-3 and r[-1] < 1e-3
    assert (np.diff(x) <= 1e-12).all() and (np.diff(r) <= 1e-12).all()
    rec, prec = roc_pr_curve(y, p, curve="PR")
    assert 0.5 < auc_riemann(y, p, curve="PR") < 1.0
    assert (prec > 0).all() and (rec >= -1e-12).all()


def test_roc_curve_nan_scores_predicted_negative():
    """NaN scores (diverged runs) count as predicted-negative at every
    threshold — matching the elementwise `score > thr` semantics the
    searchsorted implementation replaces."""
    from herald_tpu.utils.metrics import roc_pr_curve
    y = np.array([1, 1, 0, 0, 1], float)
    p = np.array([0.9, np.nan, 0.1, np.nan, 0.8])
    x, r = roc_pr_curve(y, p, num_thresholds=5)
    # at threshold -eps: only FINITE scores predict positive
    # tp = 2 (0.9, 0.8 of 3 positives), fp = 1 (0.1 of 2 negatives)
    np.testing.assert_allclose(r[0], 2 / 3, rtol=1e-5)
    np.testing.assert_allclose(x[0], 1 / 2, rtol=1e-5)
