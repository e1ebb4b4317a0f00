"""Model zoo: shapes, dtypes, quirk flags, and architectural contracts.

JAX equivalent of the reference's inline smoke tests (``models.py:351-385``) plus real
assertions the reference never had.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuhar.config import Config
from tpuhar.models.crossmodal import CrossModalModel, FusionClassifier, IMUClassifier
from tpuhar.models.imu import (
    IMUConvEncoder,
    IMUSpectrogramEncoder,
    IMUTransformerEncoder,
    PatchEmbedding,
)
from tpuhar.models.video import VideoEncoder


def tiny_config(**kw):
    cfg = Config()
    cfg.model.video_backbone = kw.pop("video_backbone", "tiny_cnn")
    cfg.model.video_pretrained = False
    cfg.model.num_classes = kw.pop("num_classes", 4)
    cfg.model.compute_dtype = kw.pop("compute_dtype", "float32")
    cfg.data.video_resize = (32, 32)
    for k, v in kw.items():
        section, key = k.split(".")
        setattr(getattr(cfg, section), key, v)
    return cfg


KEY = jax.random.PRNGKey(0)


def test_patch_embedding_shapes():
    pe = PatchEmbedding(in_channels=6, patch_size=16, stride=16, d_model=128)
    x = jnp.zeros((4, 6, 250))
    params = pe.init(KEY, x)
    out = pe.apply(params, x)
    assert out.shape == (4, 6, 15, 128)  # 250//16 = 15 patches (last 10 samples dropped, Q9)


def test_patch_embedding_channel_independence(rng):
    """Each channel has its own projection: zeroing channel k only zeroes row k."""
    pe = PatchEmbedding(in_channels=2, patch_size=4, stride=4, d_model=8)
    x = jnp.asarray(rng.normal(size=(1, 2, 16)).astype(np.float32))
    params = pe.init(KEY, x)
    base = pe.apply(params, x)
    x2 = x.at[:, 1].set(0.0)
    out = pe.apply(params, x2)
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(base[:, 0]))
    assert not np.allclose(np.asarray(out[:, 1]), np.asarray(base[:, 1]))


def test_imu_transformer_shapes():
    enc = IMUTransformerEncoder()
    x = jnp.zeros((2, 6, 250))
    params = enc.init(KEY, x)
    cls, tokens = enc.apply(params, x)
    assert cls.shape == (2, 128)
    assert tokens.shape == (2, 91, 128)  # 1 + 6*15 — all channels present (no Q1)
    assert cls.dtype == jnp.float32


def test_imu_transformer_uses_all_channels(rng):
    """Default mode: perturbing channel 5 changes the CLS embedding."""
    enc = IMUTransformerEncoder()
    x = jnp.asarray(rng.normal(size=(1, 6, 250)).astype(np.float32))
    params = enc.init(KEY, x)
    cls1, _ = enc.apply(params, x)
    cls2, _ = enc.apply(params, x.at[:, 5].add(1.0))
    assert not np.allclose(np.asarray(cls1), np.asarray(cls2))


def test_imu_transformer_quirk_q1_ignores_channels_past_0(rng):
    """Quirk mode: truncation to 16 tokens means channels 1-5 are invisible
    (reference models.py:122-123, SURVEY quirk Q1)."""
    enc = IMUTransformerEncoder(replicate_pos_truncation=True)
    x = jnp.asarray(rng.normal(size=(1, 6, 250)).astype(np.float32))
    params = enc.init(KEY, x)
    cls1, tokens = enc.apply(params, x)
    assert tokens.shape[1] == 16
    cls2, _ = enc.apply(params, x.at[:, 1:].add(2.0))
    np.testing.assert_allclose(np.asarray(cls1), np.asarray(cls2), atol=1e-6)
    cls3, _ = enc.apply(params, x.at[:, 0].add(2.0))
    assert not np.allclose(np.asarray(cls1), np.asarray(cls3))


def test_imu_conv_encoder():
    enc = IMUConvEncoder()
    x = jnp.zeros((2, 6, 250))
    variables = enc.init(KEY, x)
    emb, tokens = enc.apply(variables, x)
    assert emb.shape == (2, 128)
    assert tokens.shape[0] == 2 and tokens.shape[2] == 128
    assert "batch_stats" in variables


def test_imu_spectrogram_encoder():
    enc = IMUSpectrogramEncoder(nperseg=64, hop=32)
    x = jnp.zeros((2, 6, 250))
    params = enc.init(KEY, x)
    emb, tokens = enc.apply(params, x)
    assert emb.shape == (2, 128)
    n_frames = (250 - 64) // 32 + 1
    assert tokens.shape == (2, 1 + 6 * n_frames, 128)


@pytest.mark.parametrize("backbone,tokens_expected", [("tiny_cnn", 8), ("videomae_tiny", None)])
def test_video_encoder_backbones(backbone, tokens_expected):
    enc = VideoEncoder(backbone=backbone, video_d_model=96)
    x = jnp.zeros((2, 8, 32, 32, 3))
    variables = enc.init(KEY, x)
    emb, tokens = enc.apply(variables, x)
    assert emb.shape == (2, 96)
    if tokens_expected:
        assert tokens.shape == (2, tokens_expected, 96)
    else:
        # videomae_tiny: (8/2 tubelets) * (32/16)^2 patches = 16 tokens
        assert tokens.shape == (2, 16, 96)


@pytest.mark.slow
def test_video_encoder_resnet18_mobilenet():
    for backbone, feat in [("resnet18", 512), ("mobilenet_v2", 1280)]:
        enc = VideoEncoder(backbone=backbone, video_d_model=128)
        x = jnp.zeros((1, 2, 64, 64, 3))
        variables = enc.init(KEY, x)
        emb, tokens = enc.apply(variables, x, train=False)
        assert emb.shape == (1, 128)
        assert tokens.shape == (1, 2, 128)


def test_crossmodal_model_contract():
    cfg = tiny_config()
    model = CrossModalModel(cfg)
    imu = jnp.zeros((4, 6, 250))
    video = jnp.zeros((4, 8, 32, 32, 3))
    variables = model.init(KEY, imu, video)
    out = model.apply(variables, imu, video)
    assert out["imu_proj"].shape == (4, cfg.model.projection_dim)
    assert out["video_proj"].shape == (4, cfg.model.projection_dim)
    # L2-normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["imu_proj"]), axis=1), 1.0, atol=1e-5
    )
    # live SigLIP scalars at reference init values
    assert abs(float(out["logit_scale"]) - np.log(10.0)) < 1e-6
    assert abs(float(out["logit_bias"]) + 10.0) < 1e-6


def test_imu_classifier_contract():
    cfg = tiny_config()
    model = IMUClassifier(cfg)
    imu = jnp.zeros((4, 6, 250))
    variables = model.init(KEY, imu)
    logits, feat = model.apply(variables, imu)
    assert logits.shape == (4, 4)
    assert feat.shape == (4, 128)
    assert logits.dtype == jnp.float32


def test_imu_classifier_frozen_stops_encoder_grads(rng):
    cfg = tiny_config(**{"model.head_norm": "layer"})
    model = IMUClassifier(cfg, freeze_encoder=True)
    imu = jnp.asarray(rng.normal(size=(4, 6, 250)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, size=4))
    variables = model.init(KEY, imu)

    def loss_fn(params):
        logits, _ = model.apply({"params": params}, imu)
        from tpuhar.losses import cross_entropy_loss

        return cross_entropy_loss(logits, labels)

    grads = jax.grad(loss_fn)(variables["params"])
    enc_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["imu_encoder"])
    )
    head_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["classifier"])
    )
    assert enc_norm == 0.0
    assert head_norm > 0.0


def test_fusion_classifier_contract():
    cfg = tiny_config()
    model = FusionClassifier(cfg)
    imu = jnp.zeros((2, 6, 250))
    video = jnp.zeros((2, 8, 32, 32, 3))
    variables = model.init(KEY, imu, video)
    logits, fused = model.apply(variables, imu, video)
    assert logits.shape == (2, 4)
    assert fused.shape == (2, 2 * cfg.model.imu_d_model)


def test_bf16_compute_f32_params():
    cfg = tiny_config(compute_dtype="bfloat16")
    model = IMUClassifier(cfg)
    imu = jnp.zeros((2, 6, 250))
    variables = model.init(KEY, imu)
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
    logits, _ = model.apply(variables, imu)
    assert logits.dtype == jnp.float32


def test_tpu_video_cnn():
    from tpuhar.models.video import TPUVideoCNN

    net = TPUVideoCNN()
    x = jnp.zeros((2, 64, 64, 3))
    variables = net.init(KEY, x)
    out = net.apply(variables, x, train=False)
    assert out.shape == (2, 512)
    # space-to-depth is exact: a constant image stays constant through the reshape
    # (sanity: forward is finite and batch-independent at init)
    out2 = net.apply(variables, jnp.ones((2, 64, 64, 3)), train=False)
    assert np.isfinite(np.asarray(out2)).all()


def test_tpu_video_cnn_backbone_in_encoder():
    enc = VideoEncoder(backbone="tpu_cnn", video_d_model=96)
    x = jnp.zeros((2, 4, 64, 64, 3))
    variables = enc.init(KEY, x)
    emb, tokens = enc.apply(variables, x, train=False)
    assert emb.shape == (2, 96)
    assert tokens.shape == (2, 4, 96)
