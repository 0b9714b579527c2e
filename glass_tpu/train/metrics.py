"""Evaluation metrics (host-side, sklearn — reference: impl/metrics.py).

Metrics are computed offline on concatenated predictions, exactly as the
reference does; they are not part of the compiled compute path.
"""

from __future__ import annotations

import numpy as np
from sklearn.metrics import f1_score, roc_auc_score


def binary_f1(pred: np.ndarray, label: np.ndarray) -> float:
    """Micro-F1 with logits thresholded at 0; handles multilabel
    (reference: impl/metrics.py:5-12)."""
    pred_i = (np.asarray(pred) > 0).astype(np.int64)
    label_i = np.asarray(label).reshape(pred_i.shape[0], -1)
    return float(f1_score(label_i, pred_i, average="micro"))


def micro_f1(pred: np.ndarray, label: np.ndarray) -> float:
    """Multi-class micro-F1 over argmax (reference: impl/metrics.py:15-20)."""
    pred_i = np.argmax(np.asarray(pred), axis=1)
    return float(f1_score(np.asarray(label), pred_i, average="micro"))


def auroc(pred: np.ndarray, label: np.ndarray) -> float:
    """AUROC (reference: impl/metrics.py:23-27)."""
    return float(roc_auc_score(np.asarray(label), np.asarray(pred)))


def auroc_from_logits(logits: np.ndarray, label: np.ndarray) -> float:
    """AUROC over raw model logits for any task arity: binary (1 logit),
    multilabel (k-hot labels, per-label scores), or multiclass (softmax +
    one-vs-rest). Convenience wrapper around :func:`auroc` for the
    real-world reporting path."""
    p = np.asarray(logits)
    y = np.asarray(label)
    if p.shape[-1] == 1:
        return auroc(p.ravel(), y.ravel())
    if y.ndim > 1:  # multilabel k-hot
        return auroc(p, y)
    e = np.exp(p - p.max(axis=1, keepdims=True))
    prob = e / e.sum(axis=1, keepdims=True)
    if prob.shape[-1] == 2:
        # sklearn rejects a 2-column probability matrix with 1-D labels;
        # the binary form wants the positive-class column
        return float(roc_auc_score(y, prob[:, 1]))
    return float(roc_auc_score(y, prob, multi_class="ovr"))
