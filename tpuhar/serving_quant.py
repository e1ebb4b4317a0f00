"""Quantized serving path: int8 video tower + bf16 fusion, one XLA program.

The flagship step is dominated by the ResNet-18 video tower's bf16 bandwidth/compute
(docs/DESIGN.md); this path swaps it for the int8 PTQ tower (``tpuhar.ops.quant``) and
feeds the resulting features into the unchanged fusion stack through
``FusionClassifier.fuse_with_tokens``.  Calibration uses a handful of real (or
surrogate) clips.

Accuracy: int8 drift is bounded by the quantization tests (<15% mean feature drift,
>0.98 correlation on random nets; tighter on trained nets with real calibration).

**OOD-score recalibration** (on by default): quantization drifts the logit
distribution, which shifts msp/energy OOD scores even when predictions are stable —
on near-ceiling logits the drift alone collapsed msp AUROC 0.877→0.548 on one
held-out class (docs/int8_ood_parity.json, round 2).  At build time the calibration
clips are scored through BOTH the f32 program and the int8 program and a closed-form
affine logit map (per-class scale + bias, shrunk toward a shared scalar when
calibration is small) is fitted so the int8 program emits f32-distributed logits;
msp/energy (and downstream thresholds) then transfer from the f32 deployment
unchanged.  Validated in ``scripts/validate_int8_ood.py``.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np

from .models.crossmodal import FusionClassifier
from .ood import energy_score, msp_score
from .ops.fused_window import featurize_windows_auto
from .ops.quant import (
    calibrate_resnet18,
    calibrate_tpucnn,
    quant_resnet18_forward,
    quant_resnet18_forward_resident,
    quant_tpucnn_forward,
    quant_tpucnn_forward_resident,
    quantize_resnet18,
    quantize_tpucnn,
)
from .ops.quant_vit import calibrate_vit, quant_vit_forward, quantize_vit
from .ops.video import normalize_clip

# backbone → (calibrate, quantize, forward) triples for the int8 PTQ path
_QUANT_BACKBONES = {
    "resnet18": (calibrate_resnet18, quantize_resnet18, quant_resnet18_forward),
    "tpu_cnn": (calibrate_tpucnn, quantize_tpucnn, quant_tpucnn_forward),
    "tpu_cnn_large": (calibrate_tpucnn, quantize_tpucnn, quant_tpucnn_forward),
    "videomae_base": (calibrate_vit, quantize_vit, quant_vit_forward),
    "videomae_small": (calibrate_vit, quantize_vit, quant_vit_forward),
    "videomae_tiny": (calibrate_vit, quantize_vit, quant_vit_forward),
}
_VIT_BACKBONES = {"videomae_base", "videomae_small", "videomae_tiny"}


def fit_logit_recalibration(
    f32_logits, int8_logits, *, shrink_samples: int = 32
) -> Tuple[np.ndarray, np.ndarray]:
    """Closed-form affine map ``l → a·l + b`` aligning int8 logits to f32 logits.

    Least squares over calibration samples, per class column (``a``, ``b`` are
    ``(num_classes,)``), with each per-class scale shrunk toward the shared scalar
    solution by ``N/(N+shrink_samples)`` so tiny calibration sets degrade to the
    robust scalar fit instead of overfitting.  AUROC of msp/energy is NOT invariant
    to this map (it mixes all classes into each score), which is exactly why it
    restores the f32 score distribution.
    """
    lf = np.asarray(f32_logits, np.float64)
    l8 = np.asarray(int8_logits, np.float64)
    if lf.shape != l8.shape or lf.ndim != 2:
        raise ValueError(f"paired 2-D logits required, got {lf.shape} vs {l8.shape}")
    n = lf.shape[0]
    l8c = l8 - l8.mean(0)
    lfc = lf - lf.mean(0)
    denom_s = float((l8c * l8c).sum())
    a_scalar = float((l8c * lfc).sum() / denom_s) if denom_s > 1e-12 else 1.0
    if not np.isfinite(a_scalar) or a_scalar <= 0:
        a_scalar = 1.0
    denom_c = (l8c * l8c).sum(0)
    with np.errstate(divide="ignore", invalid="ignore"):
        a_cls = (l8c * lfc).sum(0) / denom_c
    a_cls = np.where(np.isfinite(a_cls) & (a_cls > 0), a_cls, a_scalar)
    w = n / (n + float(shrink_samples))
    a = w * a_cls + (1.0 - w) * a_scalar
    b = lf.mean(0) - a * l8.mean(0)
    return a.astype(np.float32), b.astype(np.float32)


def build_quantized_forward(
    cfg,
    variables: Dict,
    calib_clips_u8: np.ndarray,
    *,
    calib_imu_raw: Optional[np.ndarray] = None,
    recalibrate: bool = True,
    resident: bool = False,
):
    """Returns ``fn(imu_raw, video_u8) -> {logits, msp, energy, embeddings}``.

    ``variables`` is a FusionClassifier variables tree with a resnet18, tpu_cnn,
    or videomae ViT video backbone (``ops/quant.py`` / ``ops/quant_vit.py``);
    ``calib_clips_u8`` is ``(Ncal, T, H, W, 3)`` uint8 used for
    activation calibration — and, when ``recalibrate`` (default), for fitting the
    affine logit map that restores the f32 msp/energy score distribution (module
    docstring).  ``calib_imu_raw`` optionally pairs ``(Ncal, window, channels)`` raw
    IMU counts with the clips for that fit; without it surrogate raw-count noise is
    used (the int8-vs-f32 logit drift originates in the video tower — the IMU branch
    is bit-identical in both programs — so any shared IMU input exposes it).
    The fitted map is exposed as ``fn.recalibration = (a, b)`` (None if disabled).

    ``resident=True`` swaps the video tower for its int8-resident variant
    (``quant_tpucnn_forward_resident`` / ``quant_resnet18_forward_resident``) —
    producer-side quantization keeping every
    inter-conv activation int8 in HBM (4× less activation traffic than the baseline
    path's f32 residual-trunk intermediates; see the function's docstring for the
    numerics delta).  Calibration, the quantized tree, and the logit recalibration
    are shared — only the forward differs.
    """
    if cfg.model.video_backbone not in _QUANT_BACKBONES:
        raise ValueError(
            "quantized path supports backbones "
            f"{sorted(_QUANT_BACKBONES)}, got {cfg.model.video_backbone!r}"
        )
    calibrate, quantize, quant_forward = _QUANT_BACKBONES[cfg.model.video_backbone]
    is_vit = cfg.model.video_backbone in _VIT_BACKBONES
    if resident:
        if is_vit:
            raise ValueError(
                "the int8-resident path is CNN-only (producer-side quantization "
                "through conv trunks); ViT towers use the baseline int8 path"
            )
        quant_forward = (
            quant_resnet18_forward_resident
            if cfg.model.video_backbone == "resnet18"
            else quant_tpucnn_forward_resident
        )
    model = FusionClassifier(cfg)
    d = cfg.data

    venc_params = variables["params"]["video_encoder"]
    venc_stats = dict(variables.get("batch_stats", {})).get("video_encoder", {})
    bb_params = venc_params["vit"] if is_vit else venc_params["backbone"]
    bb_stats = {} if is_vit else venc_stats["backbone"]
    proj = venc_params["projection"]

    # --- calibration on normalized frames -------------------------------------------
    # Run-once host job: keep it on CPU — the calibration walk dispatches many eager
    # ops with host syncs, which is pathological on remote/tunneled TPUs.
    try:
        calib_device = jax.devices("cpu")[0]
    except RuntimeError:
        calib_device = jax.devices()[0]
    # VALID stride==kernel patch embeds (tpu_cnn's stem AND the ViT tubelet) admit
    # the exact uint8 input fold (the int8 analogue of ops/fold.py): no f32
    # normalize pass, the stem consumes u8−128 directly.
    input_fold = cfg.model.video_backbone.startswith("tpu_cnn") or is_vit
    with jax.default_device(calib_device):
        norm = np.asarray(jax.jit(normalize_clip)(calib_clips_u8))
        if is_vit:
            # the ViT consumes whole clips; a few clips ≈ the CNNs' 64 frames
            calib_in = norm[: max(64 // norm.shape[1], 2)]
        else:
            calib_in = norm.reshape((-1,) + calib_clips_u8.shape[2:4] + (3,))[:64]
        act_stats = calibrate(bb_params, bb_stats, calib_in)
        if input_fold:
            from .ops.video import IMAGENET_MEAN, IMAGENET_STD

            q = jax.device_get(
                quantize(
                    bb_params, bb_stats, act_stats,
                    input_fold=(IMAGENET_MEAN, IMAGENET_STD),
                )
            )
        else:
            q = jax.device_get(quantize(bb_params, bb_stats, act_stats))

    recal: Optional[Tuple[np.ndarray, np.ndarray]] = None

    def forward(imu_raw, video_u8):
        B, T = video_u8.shape[0], video_u8.shape[1]
        # same fused Pallas featurization as the bf16 engine (serving.py) — the jnp
        # reference path is CPU/test-only
        imu = featurize_windows_auto(
            imu_raw, kernel_size=d.median_filter_kernel,
            normalize=d.normalize_imu, racc=d.Racc, rgyro=d.Rgyro,
        )
        if is_vit:
            # whole-clip tower: raw uint8 in (tubelet input fold), tokens out
            feats = quant_forward(q, video_u8)  # (B, N, d_model) f32
        else:
            if input_fold:
                frames = video_u8.reshape((B * T,) + video_u8.shape[2:])
            else:
                video = normalize_clip(video_u8)
                frames = video.reshape((B * T,) + video.shape[2:])
            feats = quant_forward(q, frames)  # (B*T, feat_dim) f32
            feats = feats.reshape(B, T, -1)
        tokens = feats @ proj["kernel"] + proj["bias"]  # (B, ·, video_d_model)
        logits, fused = model.apply(
            variables, imu, tokens, train=False,
            method=FusionClassifier.fuse_with_tokens,
        )
        if recal is not None:
            logits = recal[0] * logits + recal[1]  # f32-distributed logits
        return {
            "logits": logits,
            "msp": msp_score(logits),
            "energy": energy_score(logits, cfg.ood.energy_temperature),
            "embeddings": fused,
        }

    if recalibrate:
        # Run-once paired scoring of the calibration clips through both programs —
        # on CPU for the same eager/remote-compile reason as the activation walk.
        clips = np.asarray(calib_clips_u8)
        if calib_imu_raw is not None:
            imu_cal = np.asarray(calib_imu_raw, np.float32)
        else:
            imu_cal = (
                np.random.default_rng(0)
                .normal(0.0, 8000.0, (len(clips), d.imu_window_size, d.imu_channels))
                .astype(np.float32)
            )

        def f32_forward(imu_raw, video_u8):
            imu = featurize_windows_auto(
                imu_raw, kernel_size=d.median_filter_kernel,
                normalize=d.normalize_imu, racc=d.Racc, rgyro=d.Rgyro,
            )
            logits, _ = model.apply(
                variables, imu, normalize_clip(video_u8), train=False
            )
            return logits

        with jax.default_device(calib_device):
            lf = np.asarray(jax.jit(f32_forward)(imu_cal, clips))
            l8 = np.asarray(jax.jit(forward)(imu_cal, clips)["logits"])
        recal = fit_logit_recalibration(lf, l8)

    forward.recalibration = recal
    return forward
