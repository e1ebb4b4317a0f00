"""Augmentation ops: shape/identity contracts and statistical behavior."""
import numpy as np

import jax
import jax.numpy as jnp

from tpuhar.config import Config
from tpuhar.ops.augment import augment_imu, jitter, time_warp

KEY = jax.random.PRNGKey(0)


def test_jitter_zero_strength_identity(rng):
    x = jnp.asarray(rng.normal(size=(2, 6, 250)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(jitter(x, KEY, 0.0)), np.asarray(x))


def test_jitter_noise_scale(rng):
    x = jnp.zeros((8, 6, 250))
    out = np.asarray(jitter(x, KEY, 0.1))
    assert 0.05 < out.std() < 0.2


def test_time_warp_preserves_shape_and_range(rng):
    x = jnp.asarray(rng.normal(size=(4, 6, 250)).astype(np.float32))
    out = np.asarray(time_warp(x, KEY, 0.2))
    assert out.shape == (4, 6, 250)
    # interpolation cannot exceed the input range
    assert out.max() <= float(np.asarray(x).max()) + 1e-6
    assert out.min() >= float(np.asarray(x).min()) - 1e-6
    # it actually moved something
    assert not np.allclose(out, np.asarray(x))


def test_time_warp_keeps_endpoints(rng):
    x = jnp.asarray(rng.normal(size=(2, 3, 100)).astype(np.float32))
    out = np.asarray(time_warp(x, KEY, 0.3))
    np.testing.assert_allclose(out[..., 0], np.asarray(x)[..., 0], atol=1e-5)
    np.testing.assert_allclose(out[..., -1], np.asarray(x)[..., -1], atol=1e-5)


def test_time_warp_smooth_signal_error_small():
    """Warping a slow sinusoid gives values close to the original curve."""
    t = np.arange(250) / 250.0
    x = jnp.asarray(np.sin(2 * np.pi * 2 * t)[None, None, :].astype(np.float32))
    out = np.asarray(time_warp(x, KEY, 0.1))
    assert np.abs(out - np.asarray(x)).max() < 0.5


def test_augment_imu_respects_config(rng):
    cfg = Config()
    x = jnp.asarray(rng.normal(size=(2, 6, 250)).astype(np.float32))
    cfg.data.use_augmentation = False
    np.testing.assert_array_equal(np.asarray(augment_imu(x, KEY, cfg)), np.asarray(x))
    cfg.data.use_augmentation = True
    out = np.asarray(augment_imu(x, KEY, cfg))
    assert not np.allclose(out, np.asarray(x))


def test_augmented_train_step_runs(rng):
    """End-to-end: classification train step with augmentation enabled."""
    from tpuhar.models.crossmodal import IMUClassifier
    from tpuhar.train.optim import make_classification_optimizer
    from tpuhar.train.steps import init_state, make_classification_steps

    cfg = Config()
    cfg.model.num_classes = 4
    cfg.model.imu_num_layers = 1
    cfg.model.imu_d_model = 32
    cfg.model.imu_nhead = 4
    cfg.model.head_norm = "layer"
    cfg.model.compute_dtype = "float32"
    cfg.data.use_augmentation = True

    model = IMUClassifier(cfg)
    imu = jnp.zeros((4, 6, 250))
    variables = model.init(KEY, imu)
    tx = make_classification_optimizer(cfg, 1, "finetune", variables["params"])
    state = init_state(model, tx, KEY, imu)
    train_step, _ = make_classification_steps(model, cfg)
    batch = {
        "imu": jnp.asarray(rng.normal(size=(4, 6, 250)).astype(np.float32)),
        "label": jnp.asarray([0, 1, 2, 3]),
        "n_valid": jnp.asarray(4),
    }
    _, metrics = train_step(state, batch, KEY)
    assert np.isfinite(float(metrics["loss"]))
