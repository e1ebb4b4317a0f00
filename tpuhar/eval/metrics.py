"""Classification metrics from an on-device confusion matrix, plus AUROC.

The reference computes metrics by shipping every prediction to host and calling sklearn
per evaluation (``src/eval/evaluator.py:55-65``, ``src/train/trainer.py:342-353``).
Here each jitted predict step scatters into a ``(C, C)`` confusion matrix on device;
the final tiny matrix crosses to host once, and the derived metrics reproduce sklearn's
semantics exactly (present-class handling included) — golden-tested against sklearn in
``tests/test_metrics.py``.

All percentages are ×100, matching the reference (``evaluator.py:57-64``).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def confusion_update(cm: jax.Array, labels: jax.Array, preds: jax.Array, valid: jax.Array):
    """Scatter-add one batch into a ``(C, C)`` confusion matrix (rows=true, cols=pred)."""
    w = valid.astype(cm.dtype)
    return cm.at[labels, preds].add(w)


def init_confusion(num_classes: int) -> jax.Array:
    return jnp.zeros((num_classes, num_classes), jnp.float32)


def metrics_from_confusion(cm) -> Dict[str, float]:
    """sklearn-equivalent metrics from a confusion matrix.

    - accuracy: trace/total
    - balanced_accuracy: mean recall over classes present in y_true
      (``balanced_accuracy_score`` semantics)
    - f1_macro / precision_macro / recall_macro: averaged over classes present in
      y_true ∪ y_pred, with absent-class scores = 0 (``f1_score(average='macro')``)
    - f1_weighted: support-weighted F1
    """
    cm = np.asarray(cm, dtype=np.float64)
    total = cm.sum()
    if total == 0:
        return {k: 0.0 for k in (
            "accuracy", "balanced_accuracy", "f1_macro", "f1_weighted",
            "precision_macro", "recall_macro",
        )}
    tp = np.diag(cm)
    support = cm.sum(axis=1)  # true counts
    predicted = cm.sum(axis=0)

    with np.errstate(divide="ignore", invalid="ignore"):
        recall = np.where(support > 0, tp / support, 0.0)
        precision = np.where(predicted > 0, tp / predicted, 0.0)
        f1 = np.where(
            (precision + recall) > 0, 2 * precision * recall / (precision + recall), 0.0
        )

    present_true = support > 0
    present_any = (support > 0) | (predicted > 0)

    accuracy = tp.sum() / total
    balanced = recall[present_true].mean() if present_true.any() else 0.0
    n_any = max(present_any.sum(), 1)
    f1_macro = f1[present_any].sum() / n_any
    precision_macro = precision[present_any].sum() / n_any
    recall_macro = recall[present_any].sum() / n_any
    f1_weighted = (
        (f1 * support).sum() / support.sum() if support.sum() > 0 else 0.0
    )

    return {
        "accuracy": 100.0 * accuracy,
        "balanced_accuracy": 100.0 * balanced,
        "f1_macro": 100.0 * f1_macro,
        "f1_weighted": 100.0 * f1_weighted,
        "precision_macro": 100.0 * precision_macro,
        "recall_macro": 100.0 * recall_macro,
    }


def auroc(scores, labels) -> float:
    """Threshold-free AUROC via the rank statistic (Mann-Whitney U).

    ``labels`` are binary (1 = positive class); ties get averaged ranks, matching
    ``sklearn.metrics.roc_auc_score``.
    """
    scores = np.asarray(scores, dtype=np.float64)
    labels = np.asarray(labels).astype(bool)
    n_pos = labels.sum()
    n_neg = (~labels).sum()
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty_like(scores)
    ranks[order] = np.arange(1, len(scores) + 1, dtype=np.float64)
    # average ranks for ties
    sorted_scores = scores[order]
    i = 0
    while i < len(sorted_scores):
        j = i
        while j + 1 < len(sorted_scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = (i + 1 + j + 1) / 2.0
        i = j + 1
    return float((ranks[labels].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))
