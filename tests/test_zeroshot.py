"""Zero-shot evaluation via cross-modal prototypes on the synthetic fixture."""
import json
from pathlib import Path

import numpy as np

import jax

from tpuhar.data.preprocess import Preprocessor
from tpuhar.eval.zeroshot import (
    compute_class_prototypes,
    run_zero_shot,
    zero_shot_evaluate,
)
from tpuhar.train.factory import build_crossmodal_task


def _tiny(cfg):
    cfg.model.imu_num_layers = 1
    cfg.model.imu_d_model = 32
    cfg.model.imu_nhead = 4
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    cfg.model.video_d_model = 48
    cfg.model.projection_dim = 16
    cfg.model.projection_hidden_dim = 32
    cfg.data.video_frames_per_window = 4
    cfg.training.pretrain_batch_size = 4
    return cfg


def test_zero_shot_pipeline(synthetic_config):
    cfg = _tiny(synthetic_config)
    pp = Preprocessor(cfg)
    dfs = {s: pp.preprocess_split(s, save=True) for s in ("train", "test")}

    task = build_crossmodal_task(cfg, 1, jax.random.PRNGKey(0))
    protos = compute_class_prototypes(task, dfs["train"], cfg)
    assert protos.shape == (cfg.model.num_classes, cfg.model.projection_dim)
    norms = np.linalg.norm(protos, axis=1)
    np.testing.assert_allclose(norms[norms > 0], 1.0, atol=1e-5)

    metrics = zero_shot_evaluate(task, protos, dfs["test"], cfg)
    assert set(metrics) >= {"accuracy", "balanced_accuracy", "f1_macro"}
    assert 0 <= metrics["accuracy"] <= 100

    out = Path(cfg.paths.results_dir) / "zeroshot_results.json"
    results = run_zero_shot(task, dfs["train"], dfs["test"], cfg, save_path=out)
    assert out.exists()
    loaded = json.loads(out.read_text())
    assert "video_prototype_zeroshot" in loaded
    assert loaded["video_prototype_zeroshot"]["accuracy"] == results[
        "video_prototype_zeroshot"
    ]["accuracy"]
