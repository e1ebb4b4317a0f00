"""Quantized serving path: runs end-to-end, stays close to the f32 fused program."""
import numpy as np

import jax
import jax.numpy as jnp

from tpuhar.config import Config
from tpuhar.models.crossmodal import FusionClassifier
from tpuhar.serving_quant import build_quantized_forward

KEY = jax.random.PRNGKey(0)


def _cfg():
    cfg = Config()
    cfg.model.num_classes = 5
    cfg.model.imu_num_layers = 1
    cfg.model.imu_d_model = 32
    cfg.model.imu_nhead = 4
    cfg.model.fusion_heads = 4
    cfg.model.classifier_hidden_dims = [16]
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    cfg.model.video_backbone = "resnet18"
    cfg.model.video_d_model = 64
    cfg.data.video_resize = (64, 64)
    cfg.data.video_frames_per_window = 2
    return cfg


def test_quantized_forward_matches_f32(rng):
    cfg = _cfg()
    model = FusionClassifier(cfg)
    B, T, H, W = 3, 2, 64, 64
    imu_raw = rng.normal(0, 8000, size=(B, 250, 6)).astype(np.float32)
    video_u8 = (rng.random((B, T, H, W, 3)) * 255).astype(np.uint8)

    variables = model.init(
        KEY, jnp.zeros((1, 6, 250)), jnp.zeros((1, T, H, W, 3))
    )

    qfn = build_quantized_forward(cfg, variables, video_u8)
    q_out = jax.device_get(jax.jit(qfn)(imu_raw, video_u8))

    # f32 reference through the standard fused path
    from tpuhar.ops.featurize import featurize_windows
    from tpuhar.ops.video import normalize_clip

    imu = featurize_windows(jnp.asarray(imu_raw))
    logits_f, _ = model.apply(
        variables, imu, normalize_clip(jnp.asarray(video_u8)), train=False
    )
    logits_f = np.asarray(logits_f)

    assert q_out["logits"].shape == logits_f.shape
    # int8 tower → small logit drift, same ranking
    corr = np.corrcoef(q_out["logits"].ravel(), logits_f.ravel())[0, 1]
    assert corr > 0.95, f"corr {corr}"
    assert (np.argmax(q_out["logits"], 1) == np.argmax(logits_f, 1)).mean() >= 2 / 3
    assert np.isfinite(q_out["msp"]).all() and np.isfinite(q_out["energy"]).all()


def test_quantized_forward_tpucnn(rng):
    """int8 PTQ path on the flagship tower (tpu_cnn backbone)."""
    cfg = _cfg()
    cfg.model.video_backbone = "tpu_cnn"
    model = FusionClassifier(cfg)
    B, T, H, W = 3, 2, 64, 64
    imu_raw = rng.normal(0, 8000, size=(B, 250, 6)).astype(np.float32)
    video_u8 = (rng.random((B, T, H, W, 3)) * 255).astype(np.uint8)

    variables = model.init(
        KEY, jnp.zeros((1, 6, 250)), jnp.zeros((1, T, H, W, 3))
    )

    qfn = build_quantized_forward(cfg, variables, video_u8)
    q_out = jax.device_get(jax.jit(qfn)(imu_raw, video_u8))

    from tpuhar.ops.featurize import featurize_windows
    from tpuhar.ops.video import normalize_clip

    imu = featurize_windows(jnp.asarray(imu_raw))
    logits_f, _ = model.apply(
        variables, imu, normalize_clip(jnp.asarray(video_u8)), train=False
    )
    logits_f = np.asarray(logits_f)

    assert q_out["logits"].shape == logits_f.shape
    corr = np.corrcoef(q_out["logits"].ravel(), logits_f.ravel())[0, 1]
    assert corr > 0.95, f"corr {corr}"
    assert np.isfinite(q_out["msp"]).all() and np.isfinite(q_out["energy"]).all()
