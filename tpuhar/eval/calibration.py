"""Confidence calibration: expected calibration error + temperature scaling.

Beyond-reference capability (the reference reports accuracy/F1 only,
``src/eval/evaluator.py:55-65``): deployment-grade HAR serving needs calibrated
confidences — msp/energy OOD thresholds, abstention rules, and downstream fusion
all read softmax margins, and both finetuning and int8 PTQ are known to distort
them (the int8 logit drift measured in ``scripts/validate_int8_ood.py`` is exactly
a miscalibration).  Temperature scaling (Guo et al. 2017) is the standard one-
parameter post-hoc fix: logits/T with T fitted by NLL on a held-out split; it
changes no argmax, so accuracy is untouched.

TPU notes: the NLL objective is jitted once and evaluated over a log-spaced
temperature grid as ONE vmapped program (no data-dependent Python control flow),
then refined by golden-section on host — the dataset crosses to device once.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def expected_calibration_error(
    logits, labels, num_bins: int = 15
) -> Dict[str, float]:
    """Standard ECE: bin predictions by confidence, average |accuracy − confidence|
    weighted by bin mass. Returns ``{"ece": ..., "mce": ..., "avg_confidence": ...,
    "accuracy": ...}`` (fractions in [0, 1], not ×100)."""
    logits = np.asarray(logits, np.float64)
    labels = np.asarray(labels)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    conf = probs.max(-1)
    correct = (probs.argmax(-1) == labels).astype(np.float64)
    edges = np.linspace(0.0, 1.0, num_bins + 1)
    # right-closed bins like the standard formulation; conf=0 lands in bin 0
    idx = np.clip(np.searchsorted(edges, conf, side="left") - 1, 0, num_bins - 1)
    ece = 0.0
    mce = 0.0
    n = len(conf)
    for b in range(num_bins):
        m = idx == b
        if not m.any():
            continue
        gap = abs(correct[m].mean() - conf[m].mean())
        ece += (m.sum() / n) * gap
        mce = max(mce, gap)
    return {
        "ece": float(ece),
        "mce": float(mce),
        "avg_confidence": float(conf.mean()),
        "accuracy": float(correct.mean()),
    }


def fit_temperature(
    logits,
    labels,
    t_min: float = 0.05,
    t_max: float = 20.0,
    grid_size: int = 64,
    refine_iters: int = 40,
) -> float:
    """Fit the temperature-scaling parameter by held-out NLL.

    One jitted vmapped NLL sweep over a log-spaced grid brackets the minimum
    (NLL(T) is convex in 1/T, hence unimodal in T), then golden-section refines
    inside the bracketing interval.  Deterministic, no optimizer state.
    """
    lg = jnp.asarray(np.asarray(logits), jnp.float32)
    y = jnp.asarray(np.asarray(labels), jnp.int32)

    @jax.jit
    def nll_grid(ts):
        def nll(t):
            logp = jax.nn.log_softmax(lg / t, axis=-1)
            return -jnp.take_along_axis(logp, y[:, None], axis=-1).mean()

        return jax.vmap(nll)(ts)

    ts = jnp.exp(jnp.linspace(jnp.log(t_min), jnp.log(t_max), grid_size))
    vals = np.asarray(nll_grid(ts))
    i = int(np.argmin(vals))
    lo = float(ts[max(i - 1, 0)])
    hi = float(ts[min(i + 1, grid_size - 1)])

    # golden-section on host; each probe reuses the same jitted program (shape-stable)
    gr = (np.sqrt(5.0) - 1.0) / 2.0
    probe = lambda t: float(nll_grid(jnp.asarray([t]))[0])  # noqa: E731
    a, b = lo, hi
    c, d = b - gr * (b - a), a + gr * (b - a)
    fc, fd = probe(c), probe(d)
    for _ in range(refine_iters):
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - gr * (b - a)
            fc = probe(c)
        else:
            a, c, fc = c, d, fd
            d = a + gr * (b - a)
            fd = probe(d)
    return float((a + b) / 2.0)


def apply_temperature(logits, temperature: float):
    """Scale logits by a fitted temperature (argmax-preserving)."""
    return jnp.asarray(logits) / jnp.float32(temperature)
