"""Metric goldens vs sklearn."""
import numpy as np
import sklearn.metrics as SK

import jax.numpy as jnp

from tpuhar.eval.metrics import (
    auroc,
    confusion_update,
    init_confusion,
    metrics_from_confusion,
)


def _cm_from(labels, preds, C):
    cm = init_confusion(C)
    cm = confusion_update(
        cm, jnp.asarray(labels), jnp.asarray(preds), jnp.ones(len(labels), bool)
    )
    return cm


def test_metrics_match_sklearn(rng):
    C = 8
    labels = rng.integers(0, C, size=500)
    preds = np.where(rng.random(500) < 0.6, labels, rng.integers(0, C, size=500))
    m = metrics_from_confusion(_cm_from(labels, preds, C))
    assert abs(m["accuracy"] - 100 * SK.accuracy_score(labels, preds)) < 1e-9
    assert abs(m["balanced_accuracy"] - 100 * SK.balanced_accuracy_score(labels, preds)) < 1e-9
    assert abs(m["f1_macro"] - 100 * SK.f1_score(labels, preds, average="macro")) < 1e-9
    assert abs(m["f1_weighted"] - 100 * SK.f1_score(labels, preds, average="weighted")) < 1e-9
    assert abs(m["precision_macro"] - 100 * SK.precision_score(labels, preds, average="macro", zero_division=0)) < 1e-9
    assert abs(m["recall_macro"] - 100 * SK.recall_score(labels, preds, average="macro", zero_division=0)) < 1e-9


def test_metrics_with_absent_classes(rng):
    """Classes never seen in y_true (or y_pred) must follow sklearn's present-class rules."""
    C = 10
    labels = rng.integers(0, 5, size=200)  # classes 5-9 absent from y_true
    preds = rng.integers(0, 7, size=200)  # 7-9 absent everywhere
    m = metrics_from_confusion(_cm_from(labels, preds, C))
    assert abs(m["balanced_accuracy"] - 100 * SK.balanced_accuracy_score(labels, preds)) < 1e-9
    assert abs(m["f1_macro"] - 100 * SK.f1_score(labels, preds, average="macro", zero_division=0)) < 1e-9


def test_confusion_respects_valid_mask():
    cm = init_confusion(3)
    labels = jnp.asarray([0, 1, 2, 2])
    preds = jnp.asarray([0, 1, 2, 0])
    valid = jnp.asarray([True, True, False, False])  # padded tail ignored
    cm = confusion_update(cm, labels, preds, valid)
    assert float(cm.sum()) == 2.0
    assert float(cm[0, 0]) == 1.0 and float(cm[1, 1]) == 1.0


def test_auroc_matches_sklearn(rng):
    scores = rng.normal(size=400)
    labels = (scores + rng.normal(0, 1.5, size=400)) > 0
    if labels.all() or not labels.any():
        labels[0] = ~labels[0]
    ours = auroc(scores, labels)
    theirs = SK.roc_auc_score(labels, scores)
    assert abs(ours - theirs) < 1e-12


def test_auroc_with_ties():
    scores = np.asarray([0.1, 0.5, 0.5, 0.5, 0.9, 0.9])
    labels = np.asarray([0, 0, 1, 1, 0, 1])
    assert abs(auroc(scores, labels) - SK.roc_auc_score(labels, scores)) < 1e-12


def test_auroc_degenerate_returns_nan():
    assert np.isnan(auroc([1.0, 2.0], [1, 1]))
