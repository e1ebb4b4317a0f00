"""Vmapped parallel few-shot harness: schema parity with the sequential path and
actual learning on the synthetic fixture."""
import numpy as np
import pytest

import jax

from tpuhar.data.preprocess import Preprocessor
from tpuhar.eval.fewshot_parallel import (
    _sample_runs,
    load_window_bank,
    run_parallel_fewshot,
)
from tpuhar.data.manifest import FewShotSampler


def _prep(cfg):
    cfg.model.imu_num_layers = 1
    cfg.model.imu_d_model = 32
    cfg.model.imu_nhead = 4
    cfg.model.classifier_hidden_dims = [16]
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    cfg.training.train_epochs = 4
    cfg.training.train_lr_encoder = 1e-3
    cfg.eval.few_shot_samples = [3]
    cfg.eval.few_shot_runs = 2
    pp = Preprocessor(cfg)
    return {s: pp.preprocess_split(s, save=True) for s in ("train", "val", "test")}


def test_sample_runs_matches_sampler_semantics(synthetic_config):
    dfs = _prep(synthetic_config)
    train_df = dfs["train"]
    idx, labels = _sample_runs(train_df, 3, 2)
    assert idx.shape == labels.shape
    # same counts per class as the sequential sampler
    seq = FewShotSampler(train_df).sample_k_per_class(3, seed=42)
    assert idx.shape[1] == len(seq)
    # different runs draw different subsets
    assert not np.array_equal(idx[0], idx[1])
    # labels consistent with the manifest
    df = train_df.reset_index(drop=True)
    np.testing.assert_array_equal(labels[0], df["label"].to_numpy()[idx[0]])


def test_window_bank_shapes(synthetic_config):
    dfs = _prep(synthetic_config)
    bank = load_window_bank(dfs["val"].head(5), synthetic_config)
    assert bank.shape == (5, 6, 250)
    assert np.abs(bank).sum() > 0


def test_parallel_fewshot_end_to_end(synthetic_config):
    cfg = synthetic_config
    dfs = _prep(cfg)
    df = run_parallel_fewshot(
        cfg, None, dfs["train"], dfs["test"], dfs["val"],
        experiment_name="par", rng=jax.random.PRNGKey(0), verbose=False,
    )
    # schema matches the sequential harness
    assert set(df.columns) >= {
        "experiment", "n_samples", "run", "mode", "accuracy",
        "balanced_accuracy", "f1_macro",
    }
    # samples × runs × modes rows
    assert len(df) == 1 * 2 * 2
    assert (df["balanced_accuracy"] >= 0).all()
    assert (df["balanced_accuracy"] <= 100).all()
    # runs differ (different subsets → different metrics, almost surely)
    by_run = df[df["mode"] == "finetune"]["balanced_accuracy"].to_numpy()
    assert np.isfinite(by_run).all()
