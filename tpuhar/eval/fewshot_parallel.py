"""Parallel few-shot harness: the R independent runs of each grid cell train
simultaneously as one vmapped program.

The reference runs its 40 few-shot trainings strictly sequentially
(``src/eval/evaluator.py:143-211``).  On TPU those runs are embarrassingly parallel:
every run of a given (n_samples, mode) cell has identical shapes (each class
contributes exactly ``min(k, count)`` windows — run-independent), so run-R states are
stacked on a leading axis and ``vmap``-ped through the same jitted train/predict steps.
One device pass trains all runs; evaluation shares the test batch across runs with
``in_axes=(0, None)``.

Semantics preserved from the sequential path: per-run sampling seeds ``run+42``
(``evaluator.py:154``), train bs 32 / eval bs 64 (``:160-161``), best-epoch selection
by balanced accuracy, metric schema, and **per-run early stopping**: each run carries
its own patience counter (``PerRunEarlyStopper``); once a run exhausts patience it is
frozen — later epochs can no longer change its best params/metric (exactly as if its
sequential training had stopped). The vmapped program keeps stepping frozen runs
(lock-step shapes) but their results are masked out; the loop exits when every run has
stopped. Best-epoch parameters are tracked on device via masked selection instead of
checkpoint files.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..data.loader import load_imu_window
from ..data.manifest import FewShotSampler
from ..models.crossmodal import IMUClassifier
from ..train.optim import make_classification_optimizer
from ..train.steps import TrainState, classification_step_fns
from .metrics import metrics_from_confusion

TRAIN_BS, EVAL_BS = 32, 64  # reference evaluator.py:160-161


class PerRunEarlyStopper:
    """Vectorized max-mode early stopping: one patience counter per run.

    Equivalent to running ``train.loop.EarlyStopper(patience, "max")`` independently
    per run and ignoring a run's values after it stops — the semantics the sequential
    harness gets from per-run trainers (golden-tested against it in
    ``tests/test_fewshot_parallel.py``).
    """

    def __init__(self, runs: int, patience: int):
        self.patience = int(patience)
        self.best = np.full((runs,), -np.inf)
        self.counters = np.zeros((runs,), np.int64)
        self.active = np.ones((runs,), bool)

    def update(self, values) -> np.ndarray:
        """Feed one epoch's per-run metric; returns the improved mask (active runs
        that set a new best — only these may have their params snapshotted)."""
        values = np.asarray(values, np.float64)
        improved = (values > self.best) & self.active
        self.best = np.where(improved, values, self.best)
        self.counters = np.where(improved, 0, self.counters + self.active)
        self.active &= self.counters < self.patience
        return improved

    @property
    def all_stopped(self) -> bool:
        return not self.active.any()


def load_window_bank(df: pd.DataFrame, config) -> np.ndarray:
    """Load every window of a manifest into one ``(N, C, T)`` array.

    Uses the packed per-split ``{split}_windows.npy`` bank when present (one bulk
    gather instead of N tiny-file reads); falls back to per-file loads.
    """
    from pathlib import Path

    d = config.data
    df = df.reset_index(drop=True)
    if "bank_idx" in df.columns and "split" in df.columns:
        try:
            parts = []
            for split, sub in df.groupby("split", sort=False):
                packed = np.load(
                    Path(config.paths.preprocessed_dir) / f"{split}_windows.npy",
                    mmap_mode="r",
                )
                parts.append(
                    (sub.index.to_numpy(), packed[sub["bank_idx"].to_numpy()])
                )
            bank = np.zeros((len(df), d.imu_window_size, d.imu_channels), np.float32)
            for idx, rows in parts:
                bank[idx] = rows
            return np.ascontiguousarray(bank.transpose(0, 2, 1))
        except (FileNotFoundError, IndexError, ValueError):
            pass
    bank = np.zeros((len(df), d.imu_channels, d.imu_window_size), np.float32)
    for i, (_, row) in enumerate(df.iterrows()):
        bank[i] = load_imu_window(
            row["imu_window_path"], config.paths.preprocessed_dir,
            d.imu_channels, d.imu_window_size,
        )
    return bank


def _sample_runs(train_df: pd.DataFrame, k: int, runs: int):
    """Per-run bank indices + labels with FewShotSampler semantics (seeds run+42)."""
    df = train_df.reset_index(drop=True).copy()
    df["bank_idx"] = np.arange(len(df))
    idx_runs, label_runs = [], []
    for run in range(runs):
        subset = FewShotSampler(df).sample_k_per_class(k, seed=run + 42)
        idx_runs.append(subset["bank_idx"].to_numpy())
        label_runs.append(subset["label"].to_numpy(np.int32))
    return np.stack(idx_runs), np.stack(label_runs)  # (R, n), (R, n)


def _batched_eval_confusions(vpredict, states, bank, labels, num_classes):
    """Per-run confusion matrices over a shared eval set: returns (R, C, C)."""
    n = len(labels)
    cms = None
    for start in range(0, n, EVAL_BS):
        sl = slice(start, min(start + EVAL_BS, n))
        bs = sl.stop - sl.start
        imu = np.zeros((EVAL_BS,) + bank.shape[1:], np.float32)
        imu[:bs] = bank[sl]
        lab = np.zeros((EVAL_BS,), np.int32)
        lab[:bs] = labels[sl]
        batch = {
            "imu": jnp.asarray(imu),
            "label": jnp.asarray(lab),
            "n_valid": jnp.asarray(np.int32(bs)),
        }
        out = vpredict(states, batch)  # preds: (R, EVAL_BS)
        preds = out["preds"]
        valid = out["valid"][0] if out["valid"].ndim == 2 else out["valid"]
        onehot_rows = jax.nn.one_hot(lab, num_classes)  # (B, C) true
        # scatter per run: cm[r, true, pred] += valid
        cm_batch = jnp.einsum(
            "bt,rbp->rtp",
            onehot_rows * valid[:, None],
            jax.nn.one_hot(preds, num_classes),
        )
        cms = cm_batch if cms is None else cms + cm_batch
    return np.asarray(cms)


def _balanced_accuracy_batch(cms: jnp.ndarray) -> jnp.ndarray:
    """Balanced accuracy per run from stacked (R, C, C) confusions (device-side)."""
    support = cms.sum(axis=2)  # (R, C)
    tp = jnp.diagonal(cms, axis1=1, axis2=2)
    recall = jnp.where(support > 0, tp / jnp.maximum(support, 1), 0.0)
    present = (support > 0).sum(axis=1)
    return 100.0 * recall.sum(axis=1) / jnp.maximum(present, 1)


def run_parallel_fewshot(
    config,
    encoder_params,
    train_df: pd.DataFrame,
    test_df: pd.DataFrame,
    val_df: Optional[pd.DataFrame] = None,
    experiment_name: str = "default",
    rng=None,
    verbose: bool = True,
) -> pd.DataFrame:
    """Vmapped few-shot grid; returns the sequential harness's row schema."""
    cfg = config
    e, t = cfg.eval, cfg.training
    rng = rng if rng is not None else jax.random.PRNGKey(t.seed)
    R = int(e.few_shot_runs)
    C = cfg.model.num_classes

    train_bank = load_window_bank(train_df, cfg)
    test_bank = load_window_bank(test_df, cfg)
    test_labels = test_df["label"].to_numpy(np.int32)
    if e.replicate_test_as_val or val_df is None:
        fit_bank, fit_labels = test_bank, test_labels  # quirk Q4 replication
    else:
        fit_bank = load_window_bank(val_df, cfg)
        fit_labels = val_df["label"].to_numpy(np.int32)

    rows: List[Dict] = []
    for n_samples in e.few_shot_samples:
        idx_runs, label_runs = _sample_runs(train_df, n_samples, R)
        n_sub = idx_runs.shape[1]
        bs = min(TRAIN_BS, n_sub)
        spe = max(n_sub // bs, 1)

        for mode in e.eval_modes:
            model = IMUClassifier(cfg, freeze_encoder=(mode == "linear_probe"))
            rng, init_rng = jax.random.split(rng)
            init_keys = jax.random.split(init_rng, R)
            example = jnp.zeros(
                (bs, cfg.data.imu_channels, cfg.data.imu_window_size), jnp.float32
            )

            def init_one(key):
                variables = model.init(key, example)
                params = dict(variables["params"])
                if encoder_params is not None:
                    params["imu_encoder"] = encoder_params
                return params, variables.get("batch_stats", {})

            params_stack, bs_stack = jax.jit(jax.vmap(init_one))(init_keys)
            tx = make_classification_optimizer(
                cfg, spe, mode, jax.tree_util.tree_map(lambda x: x[0], params_stack)
            )
            states = TrainState(
                step=jnp.zeros((R,), jnp.int32),
                params=params_stack,
                batch_stats=bs_stack,
                opt_state=jax.jit(jax.vmap(tx.init))(params_stack),  # per-run moments
                tx=tx,
            )

            train_fn, predict_fn = classification_step_fns(model, cfg)
            vtrain = jax.jit(jax.vmap(train_fn, in_axes=(0, 0, 0)), donate_argnums=(0,))
            vpredict = jax.jit(jax.vmap(predict_fn, in_axes=(0, None)))

            stopper = PerRunEarlyStopper(R, int(t.patience))
            # deep-copy: the initial params are donated into the first vtrain call
            best_params = jax.tree_util.tree_map(lambda x: x.copy(), states.params)
            num_epochs = int(t.train_epochs)

            for epoch in range(num_epochs):
                order = np.stack(
                    [
                        np.random.default_rng((run + 42) * 1000 + epoch).permutation(n_sub)
                        for run in range(R)
                    ]
                )
                for b in range(spe):
                    pos = order[:, b * bs : (b + 1) * bs]  # (R, bs)
                    bank_idx = np.take_along_axis(idx_runs, pos, axis=1)
                    imu = train_bank[bank_idx]  # (R, bs, C, T)
                    lab = np.take_along_axis(label_runs, pos, axis=1)
                    rng, step_rng = jax.random.split(rng)
                    batch = {
                        "imu": jnp.asarray(imu),
                        "label": jnp.asarray(lab),
                        "n_valid": jnp.full((R,), bs, jnp.int32),
                    }
                    states, _ = vtrain(states, batch, jax.random.split(step_rng, R))

                cms = _batched_eval_confusions(vpredict, states, fit_bank, fit_labels, C)
                bal = np.asarray(_balanced_accuracy_batch(jnp.asarray(cms)))
                improved = stopper.update(bal)  # per-run; frozen runs never improve
                if improved.any():
                    mask = jnp.asarray(improved)

                    def select(new, old):
                        m = mask.reshape((R,) + (1,) * (new.ndim - 1))
                        return jnp.where(m, new, old)

                    best_params = jax.tree_util.tree_map(
                        select, states.params, best_params
                    )
                if stopper.all_stopped:
                    break

            # final evaluation of best params on the test set
            final_states = states.replace(params=best_params)
            cms = _batched_eval_confusions(
                vpredict, final_states, test_bank, test_labels, C
            )
            for run in range(R):
                metrics = metrics_from_confusion(cms[run])
                rows.append(
                    {
                        "experiment": experiment_name,
                        "n_samples": n_samples,
                        "run": run,
                        "mode": mode,
                        **metrics,
                    }
                )
            if verbose:
                per_run = [f"{metrics_from_confusion(cms[r])['balanced_accuracy']:.1f}" for r in range(R)]
                print(
                    f"[FewShot‖] {experiment_name} n={n_samples} {mode}: "
                    f"bal_acc per run = {per_run}",
                    flush=True,
                )

    return pd.DataFrame(rows)
