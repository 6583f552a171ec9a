"""Evaluation metrics — numpy, host-side.

Spec: ``/root/reference/large/data_utils.py:199-246`` (eval_acc per-column
mean accuracy with NaN-skip; OGB-adapted eval_rocauc that uses softmax
positive-class probability for single-column labels; micro-F1), plus the
streaming count-based accuracy used by the batched evaluator
(``large/eval.py:120-131``).
"""

from __future__ import annotations

import numpy as np
from sklearn.metrics import f1_score, roc_auc_score


def _to_numpy(x):
    return np.asarray(x)


def eval_acc(y_true, y_pred) -> float:
    """Per-column mean accuracy.  ``y_true`` [N, C_lab] (possibly NaN for
    unlabeled), ``y_pred`` [N, C] logits (argmaxed here)."""
    y_true = _to_numpy(y_true)
    if y_true.ndim == 1:
        y_true = y_true[:, None]
    y_pred = _to_numpy(y_pred).argmax(axis=-1, keepdims=True)
    accs = []
    for i in range(y_true.shape[1]):
        is_labeled = y_true[:, i] == y_true[:, i]
        correct = y_true[is_labeled, i] == y_pred[is_labeled, 0]
        accs.append(float(np.sum(correct)) / len(correct))
    return sum(accs) / len(accs)


def eval_rocauc(y_true, y_pred) -> float:
    """OGB-adapted ROC-AUC.  Single-column labels use the softmax
    positive-class probability (``large/data_utils.py:223-246``)."""
    y_true = _to_numpy(y_true)
    if y_true.ndim == 1:
        y_true = y_true[:, None]
    y_pred = _to_numpy(y_pred).astype(np.float64)
    if y_true.shape[1] == 1:
        e = np.exp(y_pred - y_pred.max(axis=-1, keepdims=True))
        y_pred = (e / e.sum(axis=-1, keepdims=True))[:, 1:2]
    scores = []
    for i in range(y_true.shape[1]):
        if np.sum(y_true[:, i] == 1) > 0 and np.sum(y_true[:, i] == 0) > 0:
            is_labeled = y_true[:, i] == y_true[:, i]
            scores.append(roc_auc_score(y_true[is_labeled, i], y_pred[is_labeled, i]))
    if not scores:
        raise RuntimeError(
            "No positively labeled data available. Cannot compute ROC-AUC."
        )
    return sum(scores) / len(scores)


def eval_f1(y_true, y_pred) -> float:
    y_true = _to_numpy(y_true)
    if y_true.ndim == 1:
        y_true = y_true[:, None]
    y_pred = _to_numpy(y_pred).argmax(axis=-1, keepdims=True)
    return float(f1_score(y_true, y_pred, average="micro"))


def count_correct(y_true, y_pred) -> tuple[int, int]:
    """Streaming (total, correct) pair for batched eval
    (``large/eval.py:120-131``)."""
    y_true = _to_numpy(y_true).reshape(-1)
    y_pred = _to_numpy(y_pred).argmax(axis=-1).reshape(-1)
    return int(y_true.shape[0]), int((y_true == y_pred).sum())


METRICS = {"acc": eval_acc, "rocauc": eval_rocauc, "f1": eval_f1}
