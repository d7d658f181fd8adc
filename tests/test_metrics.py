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
