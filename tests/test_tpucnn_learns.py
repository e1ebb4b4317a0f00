"""TPUVideoCNN credibility: the fusion classifier with the TPU-designed tower learns
the synthetic fixture's class-tinted video signal (it's a real model, not just fast)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuhar.config import Config
from tpuhar.models.crossmodal import FusionClassifier
from tpuhar.train.optim import make_classification_optimizer
from tpuhar.train.steps import TrainState, make_fusion_steps

KEY = jax.random.PRNGKey(0)


def test_fusion_with_tpu_cnn_learns_video_signal(rng):
    """Class identity lives ONLY in the video tint (IMU is pure noise): learning it
    proves gradients flow through the patch-embed stem and residual stages."""
    cfg = Config()
    cfg.model.num_classes = 3
    cfg.model.imu_num_layers = 1
    cfg.model.imu_d_model = 32
    cfg.model.imu_nhead = 4
    cfg.model.fusion_heads = 4
    cfg.model.classifier_hidden_dims = [32]
    cfg.model.classifier_dropout = 0.0
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    cfg.model.video_backbone = "tpu_cnn"
    cfg.model.video_d_model = 64
    cfg.data.video_resize = (32, 32)
    cfg.data.video_frames_per_window = 2
    cfg.training.train_lr_head = 3e-3
    cfg.training.train_lr_encoder = 1e-3

    B = 12
    labels = np.arange(B) % 3
    video = rng.normal(110, 20, size=(B, 2, 32, 32, 3)).astype(np.float32)
    for i, c in enumerate(labels):
        video[i, :, :, :, c] += 90.0  # tint = class
    video_u8 = np.clip(video, 0, 255).astype(np.uint8)
    imu = rng.normal(size=(B, 6, 250)).astype(np.float32)

    model = FusionClassifier(cfg)
    variables = model.init(
        KEY, jnp.zeros((B, 6, 250)), jnp.zeros((B, 2, 32, 32, 3))
    )
    tx = make_classification_optimizer(cfg, 1, "finetune", variables["params"])
    state = TrainState.create(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
    train_step, predict_step = make_fusion_steps(model, cfg)
    batch = {
        "imu": jnp.asarray(imu),
        "video": jnp.asarray(video_u8),
        "label": jnp.asarray(labels),
        "n_valid": jnp.asarray(B),
    }
    acc = 0.0
    for step in range(40):
        state, metrics = train_step(state, batch, jax.random.fold_in(KEY, step))
        acc = float(metrics["accuracy"])
        if acc == 100.0:
            break
    assert acc >= 90.0, f"train accuracy only {acc}"
