"""int8 ViT tower: mirror exactness, quantization drift, input fold, serving path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuhar.models.video import VideoViT
from tpuhar.ops.quant_vit import (
    calibrate_vit,
    quant_vit_forward,
    quantize_vit,
    vit_forward_f32,
)

KEY = jax.random.PRNGKey(0)


def _tiny_vit(rng, depth=2, d_model=64, heads=2, B=2, T=2, HW=32):
    net = VideoViT(depth=depth, d_model=d_model, num_heads=heads)
    clip = rng.normal(0, 1.0, size=(B, T, HW, HW, 3)).astype(np.float32)
    variables = net.init(KEY, jnp.asarray(clip))
    return net, variables, clip


def test_mirror_matches_flax(rng):
    """The calibration mirror reproduces the flax VideoViT apply bit-for-bit-ish.

    Calibration observes exactly what the flax module computes — patchify order,
    attention layout, GELU flavor, LN epsilon all pinned here.
    """
    net, variables, clip = _tiny_vit(rng)
    _, tokens_flax = net.apply(variables, jnp.asarray(clip), train=False)
    tokens_mirror = vit_forward_f32(variables["params"], jnp.asarray(clip))
    np.testing.assert_allclose(
        np.asarray(tokens_mirror), np.asarray(tokens_flax), rtol=2e-4, atol=2e-5
    )


def test_quantized_vit_small_drift(rng):
    """Calibrate + quantize a random ViT; int8 tokens track the f32 tokens."""
    net, variables, clip = _tiny_vit(rng)
    params = variables["params"]
    f32_tokens = np.asarray(net.apply(variables, jnp.asarray(clip), train=False)[1])

    stats = calibrate_vit(params, {}, clip)
    assert "tubelet" in stats and "block1.mlp_mid" in stats
    q = quantize_vit(params, {}, stats)
    # f32 attention/stream on CPU keeps the test about int8 error, not bf16 error
    q_tokens = np.asarray(
        quant_vit_forward(
            q, jnp.asarray(clip), attn_dtype=jnp.float32, stream_dtype=jnp.float32
        )
    )

    assert q_tokens.shape == f32_tokens.shape
    denom = np.abs(f32_tokens).mean() + 1e-8
    rel = np.abs(q_tokens - f32_tokens).mean() / denom
    assert rel < 0.15, f"quantization drift {rel:.3f}"
    corr = np.corrcoef(q_tokens.ravel(), f32_tokens.ravel())[0, 1]
    assert corr > 0.98


def test_quantized_vit_bf16_stream_close_to_f32_stream(rng):
    """The serving-default bf16 attention/stream stays near the f32-stream path."""
    net, variables, clip = _tiny_vit(rng)
    params = variables["params"]
    stats = calibrate_vit(params, {}, clip)
    q = quantize_vit(params, {}, stats)
    t_f32 = np.asarray(
        quant_vit_forward(
            q, jnp.asarray(clip), attn_dtype=jnp.float32, stream_dtype=jnp.float32
        )
    )
    t_bf16 = np.asarray(quant_vit_forward(q, jnp.asarray(clip)))
    corr = np.corrcoef(t_bf16.ravel(), t_f32.ravel())[0, 1]
    assert corr > 0.99


def test_vit_input_fold_matches_normalized(rng):
    """input_fold (raw u8 → tubelet) ≈ normalize_clip + calibrated-quantize path."""
    from tpuhar.ops.video import IMAGENET_MEAN, IMAGENET_STD, normalize_clip

    net, variables, _ = _tiny_vit(rng)
    params = variables["params"]
    clip_u8 = (rng.random((2, 2, 32, 32, 3)) * 255).astype(np.uint8)
    norm = np.asarray(normalize_clip(jnp.asarray(clip_u8)))

    stats = calibrate_vit(params, {}, norm)
    q_plain = quantize_vit(params, {}, stats)
    q_fold = quantize_vit(params, {}, stats, input_fold=(IMAGENET_MEAN, IMAGENET_STD))

    t_plain = np.asarray(
        quant_vit_forward(
            q_plain, jnp.asarray(norm), attn_dtype=jnp.float32,
            stream_dtype=jnp.float32,
        )
    )
    t_fold = np.asarray(
        quant_vit_forward(
            q_fold, jnp.asarray(clip_u8), attn_dtype=jnp.float32,
            stream_dtype=jnp.float32,
        )
    )
    # both are int8 programs with slightly different weight grids; compare against
    # each other loosely and against f32 via correlation
    f32_tokens = np.asarray(net.apply(variables, jnp.asarray(norm), train=False)[1])
    for t in (t_plain, t_fold):
        corr = np.corrcoef(t.ravel(), f32_tokens.ravel())[0, 1]
        assert corr > 0.98, f"corr vs f32 {corr}"
    rel = np.abs(t_fold - t_plain).mean() / (np.abs(t_plain).mean() + 1e-8)
    assert rel < 0.1, f"fold-vs-plain drift {rel:.3f}"


def test_quantized_forward_videomae(rng):
    """serving_quant end-to-end on a ViT backbone (videomae_tiny)."""
    from tpuhar.config import Config
    from tpuhar.models.crossmodal import FusionClassifier
    from tpuhar.serving_quant import build_quantized_forward

    cfg = Config()
    cfg.model.num_classes = 5
    cfg.model.imu_num_layers = 1
    cfg.model.imu_d_model = 32
    cfg.model.imu_nhead = 4
    cfg.model.fusion_heads = 4
    cfg.model.classifier_hidden_dims = [16]
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    cfg.model.video_backbone = "videomae_tiny"
    cfg.model.video_d_model = 64
    cfg.data.video_resize = (32, 32)
    cfg.data.video_frames_per_window = 2

    model = FusionClassifier(cfg)
    B, T, H, W = 3, 2, 32, 32
    imu_raw = rng.normal(0, 8000, size=(B, 250, 6)).astype(np.float32)
    video_u8 = (rng.random((B, T, H, W, 3)) * 255).astype(np.uint8)

    variables = model.init(
        KEY, jnp.zeros((1, 6, 250)), jnp.zeros((1, T, H, W, 3))
    )

    qfn = build_quantized_forward(cfg, variables, video_u8)
    assert qfn.recalibration is not None
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


def test_vit_resident_rejected(rng):
    """resident=True is CNN-only; ViT towers must fail loudly, not silently."""
    from tpuhar.config import Config
    from tpuhar.serving_quant import build_quantized_forward

    cfg = Config()
    cfg.model.video_backbone = "videomae_tiny"
    with pytest.raises(ValueError, match="CNN-only"):
        build_quantized_forward(cfg, {}, np.zeros((1, 2, 32, 32, 3), np.uint8), resident=True)
