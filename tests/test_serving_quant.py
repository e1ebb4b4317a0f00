"""Quantized serving path: runs end-to-end, stays close to the f32 fused program."""
import numpy as np

import jax
import jax.numpy as jnp

from tpuhar.config import Config
from tpuhar.models.crossmodal import FusionClassifier
from tpuhar.serving_quant import build_quantized_forward, fit_logit_recalibration

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


def test_fit_logit_recalibration_recovers_affine(rng):
    """Fitting on logits that differ by a known per-class affine recovers it (and the
    mapped msp/energy distributions match f32's)."""
    from tpuhar.ood import energy_score, msp_score

    n, c = 200, 5
    lf = rng.normal(0, 3, size=(n, c)).astype(np.float32)
    a_true = np.linspace(1.2, 2.0, c).astype(np.float32)
    b_true = np.linspace(-0.5, 0.5, c).astype(np.float32)
    l8 = (lf - b_true) / a_true + rng.normal(0, 1e-3, size=(n, c)).astype(np.float32)

    # shrink_samples=0 isolates the pure per-class least-squares fit (the default
    # shrinkage trades a small bias for small-calibration robustness)
    a, b = fit_logit_recalibration(lf, l8, shrink_samples=0)
    np.testing.assert_allclose(a, a_true, atol=1e-2)
    mapped = a * l8 + b
    np.testing.assert_allclose(mapped, lf, atol=5e-2)
    np.testing.assert_allclose(
        np.asarray(msp_score(jnp.asarray(mapped))),
        np.asarray(msp_score(jnp.asarray(lf))),
        atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(energy_score(jnp.asarray(mapped))),
        np.asarray(energy_score(jnp.asarray(lf))),
        atol=5e-2,
    )


def test_fit_logit_recalibration_tiny_calibration_degrades_gracefully(rng):
    """With very few samples the per-class fit shrinks toward the scalar solution and
    never produces non-finite or negative scales."""
    lf = rng.normal(0, 2, size=(3, 4)).astype(np.float32)
    l8 = 0.5 * lf + rng.normal(0, 0.1, size=(3, 4)).astype(np.float32)
    a, b = fit_logit_recalibration(lf, l8)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert (a > 0).all()
    # shrinkage: per-class scales cluster near the shared scalar (~2.0)
    assert a.std() < a.mean()


def test_quantized_forward_recalibration_on_by_default(rng):
    """qfn ships a fitted (a, b); recalibrated logits sit closer to f32 logits than
    the raw int8 logits on held-out inputs."""
    cfg = _cfg()
    cfg.model.video_backbone = "tpu_cnn"
    model = FusionClassifier(cfg)
    B, T, H, W = 4, 2, 64, 64
    rng_np = np.random.default_rng(11)
    calib_u8 = (rng_np.random((6, T, H, W, 3)) * 255).astype(np.uint8)
    imu_raw = rng_np.normal(0, 8000, size=(B, 250, 6)).astype(np.float32)
    video_u8 = (rng_np.random((B, T, H, W, 3)) * 255).astype(np.uint8)

    variables = model.init(
        KEY, jnp.zeros((1, 6, 250)), jnp.zeros((1, T, H, W, 3))
    )

    qfn = build_quantized_forward(cfg, variables, calib_u8)
    assert qfn.recalibration is not None
    a, b = qfn.recalibration
    assert a.shape == (cfg.model.num_classes,) and np.isfinite(a).all()

    qfn_raw = build_quantized_forward(cfg, variables, calib_u8, recalibrate=False)
    assert qfn_raw.recalibration is None

    out = jax.device_get(jax.jit(qfn)(imu_raw, video_u8))
    out_raw = jax.device_get(jax.jit(qfn_raw)(imu_raw, video_u8))
    # the recalibrated logits ARE the affine image of the raw ones
    np.testing.assert_allclose(
        out["logits"], a * out_raw["logits"] + b, rtol=1e-5, atol=1e-5
    )

    from tpuhar.ops.featurize import featurize_windows
    from tpuhar.ops.video import normalize_clip

    imu = featurize_windows(jnp.asarray(imu_raw))
    logits_f, _ = model.apply(
        variables, imu, normalize_clip(jnp.asarray(video_u8)), train=False
    )
    logits_f = np.asarray(logits_f)
    err_recal = np.abs(out["logits"] - logits_f).mean()
    err_raw = np.abs(out_raw["logits"] - logits_f).mean()
    assert err_recal <= err_raw * 1.05, (err_recal, err_raw)
