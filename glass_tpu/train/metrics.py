"""Evaluation metrics (reference: impl/metrics.py).

Two tiers:

- host-side sklearn on concatenated logits, exactly like the reference
  (impl/train.py:20-34) — the cross-check path and the AUROC reporting path;
- :func:`device_micro_f1`, the same micro-F1 computed *inside* the eval
  program from O(1) reduced scalars. Micro-F1 over multiclass argmax is
  accuracy, and binary/multilabel micro-F1 needs only the TP/FP/FN sums, so
  a per-epoch evaluation syncs one scalar instead of an (S, C) logits array
  — on a remote-TPU tunnel whose per-dispatch round-trips can degrade to
  ~250 ms, the array readback was the protocol's availability weak point
  (RESULTS.md round-4: a 45x CLI throughput collapse with no code change).
  Equality with sklearn on every task arity is pinned by tests.
"""

from __future__ import annotations

import numpy as np
from sklearn.metrics import f1_score, roc_auc_score

import jax.numpy as jnp


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


def device_metric_counts(logits, y_pad, mask, binary: bool):
    """The micro-F1 sufficient statistics as a traced int32 (TP, FP, FN).

    The metric is a ratio of integer counts, so the counts are computed
    (and, when sharded, psum'd) on device and the division happens on the
    host in float64 — making the result EXACTLY the sklearn value
    (:func:`binary_f1` / :func:`micro_f1`) while the per-eval readback is
    one tiny vector instead of the (S, C) logits array.

    The three sklearn cases collapse onto one (TP, FP, FN) formula:

    - multilabel (binary, C>1): sklearn sees a multilabel indicator matrix
      and micro-F1 counts TP/FP/FN over all (sample, label) cells;
    - single-logit binary (binary, C==1): sklearn squeezes the (n, 1)
      column to 1-D binary labels, where micro-averaging over BOTH classes
      makes micro-F1 equal accuracy — mapped here as TP=correct,
      FP=FN=wrong, since 2c/(2c + 2(t-c)) = c/t;
    - multiclass argmax (not binary): micro-F1 is accuracy, same mapping.

    Args:
      logits: (nb, B, C) model outputs (padded eval batches).
      y_pad:  (nb, B) integer labels (multiclass) or (nb, B) / (nb, B, L)
              binary/multilabel targets, zero-padded like the batches.
      mask:   (nb, B) bool, False on the right-padding rows.
      binary: True = threshold-at-0 semantics; False = argmax.
    """
    if binary and logits.shape[-1] > 1:
        pred = logits > 0
        yb = y_pad.reshape(pred.shape[0], pred.shape[1], -1) > 0.5
        m = mask[..., None]
        tp = jnp.sum(pred & yb & m)
        fp = jnp.sum(pred & ~yb & m)
        fn = jnp.sum(~pred & yb & m)
        return jnp.stack([tp, fp, fn]).astype(jnp.int32)
    if binary:  # single logit: thresholded accuracy
        pred = logits[..., 0] > 0
        hit = pred == (y_pad.reshape(pred.shape) > 0.5)
    else:  # multiclass: argmax accuracy
        hit = jnp.argmax(logits, axis=-1) == y_pad
    correct = jnp.sum(hit & mask)
    wrong = mask.sum() - correct
    return jnp.stack([correct, wrong, wrong]).astype(jnp.int32)


def score_from_counts(counts: np.ndarray) -> float:
    """Host-side float64 division of :func:`device_metric_counts` output
    (sklearn zero_division=0 behavior on an empty denominator)."""
    tp, fp, fn = np.asarray(counts, dtype=np.int64)
    denom = 2 * tp + fp + fn
    return float(2 * tp / denom) if denom > 0 else 0.0


def pad_eval_labels(y_p: np.ndarray, nb: int, batch_size: int):
    """(y_pad, mask) matching make_eval_batches' right-padded layout: labels
    zero-padded to (nb, batch_size, ...), mask False on the padding rows."""
    n = y_p.shape[0]
    pad = nb * batch_size - n
    y_pad = np.concatenate(
        [y_p, np.zeros((pad,) + y_p.shape[1:], dtype=y_p.dtype)]
    ).reshape((nb, batch_size) + y_p.shape[1:])
    mask = (np.arange(nb * batch_size) < n).reshape(nb, batch_size)
    return y_pad, mask


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
