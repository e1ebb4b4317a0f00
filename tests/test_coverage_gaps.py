"""Coverage for paths not exercised elsewhere: engine-from-checkpoint,
baseline-vs-pretrained comparison, distributed no-op, CLI ablate mode."""
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

KEY = jax.random.PRNGKey(0)


def test_inference_engine_from_checkpoint(tmp_path, rng):
    from tpuhar.config import Config
    from tpuhar.serving import InferenceEngine
    from tpuhar.train import checkpoint as ckpt
    from tpuhar.train.factory import build_classification_task

    cfg = Config()
    cfg.model.num_classes = 4
    cfg.model.imu_num_layers = 1
    cfg.model.imu_d_model = 32
    cfg.model.imu_nhead = 4
    cfg.model.classifier_hidden_dims = [16]
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"

    task = build_classification_task(cfg, "finetune", 1, KEY, batch_size=4)
    ckpt.save_checkpoint(tmp_path / "best", task.state, extra={"epoch": 0})

    engine = InferenceEngine.from_checkpoint(
        cfg, tmp_path / "best", imu_only=True, batch_sizes=[4]
    )
    out = engine.predict(rng.normal(0, 8000, size=(4, 250, 6)).astype(np.float32))
    assert out["logits"].shape == (4, 4)

    # from_checkpoint must reproduce the saved params' logits exactly
    from tpuhar.ops.featurize import featurize_windows

    imu_raw = rng.normal(0, 8000, size=(4, 250, 6)).astype(np.float32)
    direct, _ = task.model.apply(
        {"params": task.state.params, "batch_stats": task.state.batch_stats},
        featurize_windows(jnp.asarray(imu_raw)),
        train=False,
    )
    out2 = engine.predict(imu_raw)
    np.testing.assert_allclose(out2["logits"], np.asarray(direct), atol=1e-5)


def test_compare_baseline_vs_pretrained(synthetic_config):
    from tpuhar.data.preprocess import Preprocessor
    from tpuhar.eval.evaluator import compare_baseline_vs_pretrained
    from tpuhar.train.factory import build_classification_task

    cfg = synthetic_config
    cfg.model.imu_num_layers = 1
    cfg.model.imu_d_model = 32
    cfg.model.imu_nhead = 4
    cfg.model.classifier_hidden_dims = [16]
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    cfg.training.train_epochs = 1
    cfg.training.train_batch_size = 8

    pp = Preprocessor(cfg)
    dfs = {s: pp.preprocess_split(s, save=True) for s in ("train", "val", "test")}

    # "pretrained" encoder = a freshly initialized tree (structure is what matters)
    donor = build_classification_task(cfg, "finetune", 1, KEY, batch_size=4)
    enc_params = donor.state.params["imu_encoder"]

    df = compare_baseline_vs_pretrained(
        cfg, dfs["train"], dfs["val"], dfs["test"],
        pretrained_encoder_params=enc_params, rng=KEY, verbose=False,
    )
    assert set(df.index) == {"baseline", "pretrained"}
    assert "balanced_accuracy" in df.columns
    assert np.isfinite(df["balanced_accuracy"]).all()


def test_distributed_initialize_noop(monkeypatch):
    from tpuhar.parallel.distributed import initialize_distributed, local_batch_slice

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert initialize_distributed() is False  # single-process → no-op

    sl = local_batch_slice(64)
    assert sl == slice(0, 64)  # one process owns the whole batch


def test_cli_ablate_mode(synthetic_config, monkeypatch):
    from tpuhar.cli import Pipeline

    cfg = synthetic_config
    cfg.model.imu_num_layers = 1
    cfg.model.imu_d_model = 32
    cfg.model.imu_nhead = 4
    cfg.model.imu_cnn_channels = [16]
    cfg.model.classifier_hidden_dims = [16]
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    cfg.training.train_epochs = 1
    cfg.training.train_batch_size = 8

    p = Pipeline(cfg)
    p.run_preprocessing()
    # shrink the default ablation grid for CI
    import tpuhar.eval.ablation as A

    monkeypatch.setattr(
        A, "DEFAULT_ABLATIONS",
        [("transformer_raw", {}), ("cnn_raw", {"model.imu_encoder": "cnn"})],
    )
    df = p.run_ablations()
    assert list(df["config"]) == ["transformer_raw", "cnn_raw"]
    assert (Path(cfg.paths.results_dir) / "ablation_results.csv").exists()


def test_video_only_classifier(rng):
    from tpuhar.config import Config
    from tpuhar.train.factory import build_video_task

    cfg = Config()
    cfg.model.num_classes = 4
    cfg.model.video_backbone = "tiny_cnn"
    cfg.model.video_d_model = 32
    cfg.model.classifier_hidden_dims = [16]
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    cfg.data.video_resize = (32, 32)
    cfg.data.video_frames_per_window = 2

    task = build_video_task(cfg, 1, KEY, batch_size=4)
    batch = {
        "video": jnp.asarray((rng.random((4, 2, 32, 32, 3)) * 255).astype(np.uint8)),
        "label": jnp.asarray([0, 1, 2, 3]),
        "n_valid": jnp.asarray(4),
    }
    state, m = task.train_step(task.state, batch, KEY)
    assert np.isfinite(float(m["loss"]))
    out = task.eval_step(state, batch)
    assert out["logits"].shape == (4, 4)
    assert out["embeddings"].shape == (4, 32)
