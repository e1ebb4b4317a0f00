"""Window-size flexibility: the stack works at non-default window configurations,
e.g. UCI-HAR-style 128-sample windows (BASELINE.json config
"IMU-only 1D-CNN classifier on 128-sample accel/gyro windows")."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuhar.config import Config
from tpuhar.models.crossmodal import IMUClassifier
from tpuhar.ops.featurize import featurize_windows, preprocess_sequence
from tpuhar.train.optim import make_classification_optimizer
from tpuhar.train.steps import init_state, make_classification_steps

KEY = jax.random.PRNGKey(0)


def _uci_har_cfg(encoder: str):
    cfg = Config()
    cfg.data.imu_window_size = 128  # UCI-HAR: 2.56 s at 50 Hz
    cfg.data.imu_stride = 64
    cfg.model.num_classes = 6  # UCI-HAR classes
    cfg.model.imu_encoder = encoder
    cfg.model.imu_num_layers = 1
    cfg.model.imu_d_model = 32
    cfg.model.imu_nhead = 4
    cfg.model.imu_cnn_channels = [32, 64]
    cfg.model.classifier_hidden_dims = [32]
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    return cfg


@pytest.mark.parametrize("encoder", ["transformer", "cnn"])
def test_uci_har_window_classifier_trains(encoder, rng):
    cfg = _uci_har_cfg(encoder)
    model = IMUClassifier(cfg)
    B = 8
    imu = jnp.zeros((B, 6, 128))
    variables = model.init(KEY, imu)
    tx = make_classification_optimizer(cfg, 1, "finetune", variables["params"])
    state = init_state(model, tx, KEY, imu)
    train_step, predict_step = make_classification_steps(model, cfg)
    batch = {
        "imu": jnp.asarray(rng.normal(size=(B, 6, 128)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 6, B)),
        "n_valid": jnp.asarray(B),
    }
    state, metrics = train_step(state, batch, KEY)
    assert np.isfinite(float(metrics["loss"]))
    out = predict_step(state, batch)
    assert out["logits"].shape == (B, 6)


def test_featurize_128_sample_windows(rng):
    raw = rng.normal(0, 8000, size=(4, 128, 6)).astype(np.float32)
    out = featurize_windows(jnp.asarray(raw))
    assert out.shape == (4, 6, 128)


def test_preprocess_sequence_128_windows(rng):
    padded = np.zeros((512, 6), np.float32)
    padded[:400] = rng.normal(0, 8000, size=(400, 6))
    windows, n = preprocess_sequence(
        jnp.asarray(padded), jnp.asarray(400), window=128, stride=64
    )
    assert int(n) == (400 - 128) // 64 + 1
    assert windows.shape[1:] == (128, 6)


def test_transformer_token_count_scales_with_window():
    from tpuhar.models.imu import IMUTransformerEncoder

    enc = IMUTransformerEncoder(window_size=128)
    x = jnp.zeros((1, 6, 128))
    params = enc.init(KEY, x)
    _, tokens = enc.apply(params, x)
    # (128-16)//16+1 = 8 patches/channel → 1 + 48 tokens
    assert tokens.shape[1] == 1 + 6 * 8
