"""Fidelity-surface tests: the fused serving program equals the step-by-step chain.

BASELINE.json names per-window logits / OOD scores as the numeric fidelity surface;
these tests pin the one-XLA-program serving path against an explicit host-side
composition of the same stages (scipy featurization → flax forward → numpy OOD).
"""
import numpy as np
import scipy.signal as signal

import jax
import jax.numpy as jnp

from tpuhar.config import Config
from tpuhar.models.crossmodal import FusionClassifier
from tpuhar.ood import energy_score, msp_score
from tpuhar.ops.featurize import featurize_windows
from tpuhar.ops.video import IMAGENET_MEAN, IMAGENET_STD, normalize_clip

KEY = jax.random.PRNGKey(7)


def _cfg():
    cfg = Config()
    cfg.model.num_classes = 6
    cfg.model.imu_num_layers = 2
    cfg.model.imu_d_model = 32
    cfg.model.imu_nhead = 4
    cfg.model.fusion_heads = 4
    cfg.model.classifier_hidden_dims = [16]
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    cfg.model.video_backbone = "tiny_cnn"
    cfg.model.video_d_model = 32
    cfg.data.video_resize = (32, 32)
    cfg.data.video_frames_per_window = 4
    return cfg


def test_fused_program_matches_reference_chain(rng):
    cfg = _cfg()
    d = cfg.data
    model = FusionClassifier(cfg)
    B = 4
    imu_raw = rng.normal(0, 8000, size=(B, 250, 6)).astype(np.float32)
    video_u8 = (rng.random((B, 4, 32, 32, 3)) * 255).astype(np.uint8)

    variables = model.init(KEY, jnp.zeros((B, 6, 250)), jnp.zeros((B, 4, 32, 32, 3)))

    # --- fused single-program path (what serving/bench run) -----------------------
    @jax.jit
    def fused(imu_r, vid):
        imu = featurize_windows(imu_r, racc=d.Racc, rgyro=d.Rgyro)
        logits, emb = model.apply(variables, imu, normalize_clip(vid), train=False)
        return logits, msp_score(logits), energy_score(logits)

    logits_f, msp_f, energy_f = jax.device_get(fused(imu_raw, video_u8))

    # --- explicit host-side reference chain ---------------------------------------
    # featurization per the reference formulas (scipy medfilt, per-window z-score)
    imu_host = np.zeros((B, 6, 250), np.float32)
    for b in range(B):
        phys = np.concatenate(
            [imu_raw[b, :, :3] / d.Racc, imu_raw[b, :, 3:] / d.Rgyro], axis=1
        )
        filt = np.stack(
            [signal.medfilt(phys[:, c], 5) for c in range(6)], axis=1
        )
        norm = (filt - filt.mean(0, keepdims=True)) / (
            filt.std(0, keepdims=True) + 1e-8
        )
        imu_host[b] = norm.T
    # ImageNet normalization per the reference transform
    vid_host = (video_u8.astype(np.float32) / 255.0 - np.asarray(IMAGENET_MEAN)) / (
        np.asarray(IMAGENET_STD)
    )

    logits_h, _ = model.apply(
        variables, jnp.asarray(imu_host), jnp.asarray(vid_host.astype(np.float32)),
        train=False,
    )
    logits_h = np.asarray(logits_h)

    np.testing.assert_allclose(logits_f, logits_h, atol=2e-4, rtol=1e-3)

    # OOD scores from the same logits, host formulas
    p = np.exp(logits_h - logits_h.max(1, keepdims=True))
    p /= p.sum(1, keepdims=True)
    np.testing.assert_allclose(msp_f, 1 - p.max(1), atol=1e-5)
    lse = np.log(np.exp(logits_h - logits_h.max(1, keepdims=True)).sum(1)) + logits_h.max(1)
    np.testing.assert_allclose(energy_f, -lse, atol=2e-4)


def test_pallas_kernel_in_serving_chain(rng):
    """The Pallas fused-window kernel slots into the fused program bit-compatibly."""
    from tpuhar.ops.fused_window import featurize_windows_pallas

    imu_raw = rng.normal(0, 8000, size=(3, 250, 6)).astype(np.float32)
    a = np.asarray(featurize_windows(jnp.asarray(imu_raw)))
    b = np.asarray(featurize_windows_pallas(jnp.asarray(imu_raw), interpret=True))
    np.testing.assert_allclose(a, b, atol=2e-5)
