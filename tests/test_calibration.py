"""Calibration: ECE semantics + temperature-scaling fit."""
import numpy as np
import pytest

from tpuhar.eval.calibration import (
    apply_temperature,
    expected_calibration_error,
    fit_temperature,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _well_calibrated_logits(rng, n=4000, c=4, scale=1.0):
    """Draw labels FROM the softmax of the logits → perfectly calibrated by
    construction (at scale 1.0)."""
    logits = rng.normal(0, 2, size=(n, c))
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    labels = np.array([rng.choice(c, p=pi) for pi in p])
    return logits * scale, labels


def test_ece_zero_for_calibrated_and_large_for_overconfident(rng):
    logits, labels = _well_calibrated_logits(rng)
    cal = expected_calibration_error(logits, labels)
    over = expected_calibration_error(logits * 5.0, labels)
    assert cal["ece"] < 0.05
    assert over["ece"] > cal["ece"] + 0.1
    assert over["accuracy"] == cal["accuracy"]  # scaling never moves the argmax
    assert over["avg_confidence"] > cal["avg_confidence"]


def test_ece_handcomputed_two_bins():
    # 2 samples, confidences 0.9/0.6 both "class 0"; one correct, one wrong
    logits = np.log(np.array([[0.9, 0.1], [0.6, 0.4]]))
    labels = np.array([0, 1])
    out = expected_calibration_error(logits, labels, num_bins=10)
    # bin(0.9): acc 1, conf .9 → gap .1; bin(0.6): acc 0, conf .6 → gap .6
    assert out["ece"] == pytest.approx(0.5 * 0.1 + 0.5 * 0.6, abs=1e-6)
    assert out["mce"] == pytest.approx(0.6, abs=1e-6)


def test_fit_temperature_recovers_known_scale(rng):
    logits, labels = _well_calibrated_logits(rng)
    t = fit_temperature(logits * 3.0, labels)
    assert t == pytest.approx(3.0, rel=0.15)
    t1 = fit_temperature(logits, labels)
    assert t1 == pytest.approx(1.0, rel=0.15)


def test_temperature_reduces_ece(rng):
    logits, labels = _well_calibrated_logits(rng, scale=4.0)
    before = expected_calibration_error(logits, labels)["ece"]
    t = fit_temperature(logits, labels)
    after = expected_calibration_error(
        np.asarray(apply_temperature(logits, t)), labels
    )["ece"]
    assert after < before
    assert after < 0.05


def test_temperature_preserves_argmax(rng):
    logits = rng.normal(size=(64, 5)).astype(np.float32)
    scaled = np.asarray(apply_temperature(logits, 2.7))
    np.testing.assert_array_equal(scaled.argmax(-1), logits.argmax(-1))
