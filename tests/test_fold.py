"""Normalize-folding serving rewrite (ops/fold.py): exactness + applicability gates."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuhar.config import Config
from tpuhar.models.crossmodal import FusionClassifier
from tpuhar.ops.fold import fold_normalization
from tpuhar.ops.video import normalize_clip

KEY = jax.random.PRNGKey(7)


def _tiny_cfg(backbone):
    cfg = Config()
    cfg.model.num_classes = 3
    cfg.model.imu_num_layers = 1
    cfg.model.imu_d_model = 32
    cfg.model.imu_nhead = 4
    cfg.model.fusion_heads = 4
    cfg.model.classifier_hidden_dims = [16]
    cfg.model.classifier_dropout = 0.0
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    cfg.model.video_backbone = backbone
    cfg.model.video_d_model = 48
    cfg.data.video_resize = (32, 32)
    cfg.data.video_frames_per_window = 4
    return cfg


def _fused_logits(cfg, variables, imu, video):
    model = FusionClassifier(cfg)
    logits, emb = model.apply(variables, imu, video, train=False)
    return np.asarray(logits), np.asarray(emb)


@pytest.mark.parametrize("backbone", ["tpu_cnn", "videomae_tiny"])
def test_fold_matches_normalize_path(backbone, rng):
    """Folded weights on RAW pixels ≡ original weights on normalized pixels."""
    cfg = _tiny_cfg(backbone)
    model = FusionClassifier(cfg)
    B = 4
    imu = jnp.asarray(rng.normal(size=(B, 6, 250)).astype(np.float32))
    video_u8 = rng.integers(0, 256, size=(B, 4, 32, 32, 3)).astype(np.uint8)

    variables = model.init(KEY, imu, jnp.zeros((B, 4, 32, 32, 3)))
    folded_vars, changed = fold_normalization(variables, cfg)
    assert changed

    ref_logits, ref_emb = _fused_logits(
        cfg, variables, imu, normalize_clip(jnp.asarray(video_u8))
    )
    got_logits, got_emb = _fused_logits(
        cfg, folded_vars, imu, jnp.asarray(video_u8).astype(jnp.float32)
    )
    np.testing.assert_allclose(got_logits, ref_logits, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got_emb, ref_emb, rtol=2e-4, atol=2e-4)


def test_fold_refuses_padded_stem(rng):
    """ResNet-18's pad-3 7×7 stem is not exactly foldable → changed=False, tree intact."""
    cfg = _tiny_cfg("resnet18")
    model = FusionClassifier(cfg)
    variables = model.init(
        KEY, jnp.zeros((2, 6, 250)), jnp.zeros((2, 4, 32, 32, 3))
    )
    out, changed = fold_normalization(variables, cfg)
    assert not changed
    k0 = variables["params"]["video_encoder"]["backbone"]["stem_conv"]["kernel"]
    k1 = out["params"]["video_encoder"]["backbone"]["stem_conv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))


def test_fold_leaves_original_variables_untouched(rng):
    """The rewrite is functional: the input tree's stem leaves are not mutated."""
    cfg = _tiny_cfg("tpu_cnn")
    model = FusionClassifier(cfg)
    variables = model.init(
        KEY, jnp.zeros((2, 6, 250)), jnp.zeros((2, 4, 32, 32, 3))
    )
    before = np.asarray(
        variables["params"]["video_encoder"]["backbone"]["stem_conv"]["kernel"]
    ).copy()
    folded_vars, changed = fold_normalization(variables, cfg)
    assert changed
    after = np.asarray(
        variables["params"]["video_encoder"]["backbone"]["stem_conv"]["kernel"]
    )
    np.testing.assert_array_equal(before, after)
    assert not np.allclose(
        np.asarray(
            folded_vars["params"]["video_encoder"]["backbone"]["stem_conv"]["kernel"]
        ),
        before,
    )


def test_engine_folded_matches_unfolded(synthetic_config, rng):
    """InferenceEngine(fold_normalize=True) serves the same logits as the
    normalize-path engine for the tpu_cnn flagship config."""
    from tpuhar.serving import InferenceEngine
    from tpuhar.train.factory import build_fusion_task

    cfg = _tiny_cfg("tpu_cnn")
    cfg.paths = synthetic_config.paths
    task = build_fusion_task(cfg, 1, KEY, batch_size=2)
    variables = {"params": task.state.params, "batch_stats": task.state.batch_stats}

    eng_ref = InferenceEngine(cfg, variables, batch_sizes=[4], fold_normalize=False)
    eng_fold = InferenceEngine(cfg, variables, batch_sizes=[4], fold_normalize=True)
    assert eng_fold.folded and not eng_ref.folded

    imu = rng.normal(size=(3, 250, 6)).astype(np.float32)
    video = rng.integers(0, 256, size=(3, 4, 32, 32, 3)).astype(np.uint8)
    a = eng_ref.predict(imu, video)
    b = eng_fold.predict(imu, video)
    np.testing.assert_allclose(b["logits"], a["logits"], rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(b["preds"], a["preds"])
