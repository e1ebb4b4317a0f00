"""Ablation harness + profiling/metric-logging units."""
import json

import numpy as np
import pandas as pd

import jax

from tpuhar.data.preprocess import Preprocessor
from tpuhar.eval.ablation import run_ablations
from tpuhar.utils.profiling import MetricsLogger, StepProfiler, annotate, trace


def test_metrics_logger_roundtrip(tmp_path):
    ml = MetricsLogger(tmp_path, name="m")
    ml.log(0, {"loss": 1.5, "acc": 10.0}, stage="train")
    ml.log(1, {"loss": 1.2, "acc": 20.0}, stage="train")
    rows = ml.read()
    assert len(rows) == 2
    assert rows[1]["loss"] == 1.2
    assert (tmp_path / "m.csv").exists()
    df = pd.read_csv(tmp_path / "m.csv")
    assert list(df["step"]) == [0, 1]


def test_step_profiler():
    sp = StepProfiler()
    for _ in range(5):
        sp.start()
        sp.stop()
    s = sp.summary()
    assert s["steps"] == 5
    assert s["p50_ms"] >= 0


def test_trace_disabled_noop(tmp_path):
    with trace(tmp_path / "prof", enabled=False):
        pass
    assert not (tmp_path / "prof").exists()


def test_annotate_scope():
    with annotate("test-scope"):
        x = jax.numpy.ones(4).sum()
    assert float(x) == 4.0


def test_ablation_harness(synthetic_config):
    cfg = synthetic_config
    cfg.model.imu_num_layers = 1
    cfg.model.imu_d_model = 32
    cfg.model.imu_nhead = 4
    cfg.model.imu_cnn_channels = [16, 32]
    cfg.model.classifier_hidden_dims = [16]
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    cfg.training.train_epochs = 2
    cfg.training.train_batch_size = 8
    pp = Preprocessor(cfg)
    dfs = {s: pp.preprocess_split(s, save=True) for s in ("train", "val", "test")}

    ablations = [
        ("transformer_raw", {}),
        ("cnn_raw", {"model.imu_encoder": "cnn"}),
        ("stft", {"data.imu_featurizer": "stft"}),
    ]
    df = run_ablations(
        cfg, dfs["train"], dfs["val"], dfs["test"], ablations,
        rng=jax.random.PRNGKey(0), verbose=False,
    )
    assert list(df["config"]) == ["transformer_raw", "cnn_raw", "stft"]
    assert {"accuracy", "balanced_accuracy", "f1_macro"} <= set(df.columns)
    assert np.isfinite(df["balanced_accuracy"]).all()
    # base config untouched by ablation overrides
    assert cfg.model.imu_encoder == "transformer"
    assert cfg.data.imu_featurizer == "raw"
