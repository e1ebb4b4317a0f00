"""Quantized serving path: int8 video tower + bf16 fusion, one XLA program.

The flagship step is dominated by the ResNet-18 video tower's bf16 bandwidth/compute
(docs/DESIGN.md); this path swaps it for the int8 PTQ tower (``tpuhar.ops.quant``) and
feeds the resulting features into the unchanged fusion stack through
``FusionClassifier.fuse_with_tokens``.  Calibration uses a handful of real (or
surrogate) clips.

Accuracy: int8 drift is bounded by the quantization tests (<15% mean feature drift,
>0.98 correlation on random nets; tighter on trained nets with real calibration).
"""
from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from .models.crossmodal import FusionClassifier
from .ood import energy_score, msp_score
from .ops.featurize import featurize_windows
from .ops.quant import (
    calibrate_resnet18,
    calibrate_tpucnn,
    quant_resnet18_forward,
    quant_tpucnn_forward,
    quantize_resnet18,
    quantize_tpucnn,
)
from .ops.video import normalize_clip

# backbone → (calibrate, quantize, forward) triples for the int8 PTQ path
_QUANT_BACKBONES = {
    "resnet18": (calibrate_resnet18, quantize_resnet18, quant_resnet18_forward),
    "tpu_cnn": (calibrate_tpucnn, quantize_tpucnn, quant_tpucnn_forward),
    "tpu_cnn_large": (calibrate_tpucnn, quantize_tpucnn, quant_tpucnn_forward),
}


def build_quantized_forward(cfg, variables: Dict, calib_clips_u8: np.ndarray):
    """Returns ``fn(imu_raw, video_u8) -> {logits, msp, energy, embeddings}``.

    ``variables`` is a FusionClassifier variables tree with a resnet18 or tpu_cnn
    video backbone; ``calib_clips_u8`` is ``(Ncal, T, H, W, 3)`` uint8 used for
    activation calibration.
    """
    if cfg.model.video_backbone not in _QUANT_BACKBONES:
        raise ValueError(
            "quantized path supports backbones "
            f"{sorted(_QUANT_BACKBONES)}, got {cfg.model.video_backbone!r}"
        )
    calibrate, quantize, quant_forward = _QUANT_BACKBONES[cfg.model.video_backbone]
    model = FusionClassifier(cfg)
    d = cfg.data

    venc_params = variables["params"]["video_encoder"]
    venc_stats = dict(variables.get("batch_stats", {})).get("video_encoder", {})
    bb_params = venc_params["backbone"]
    bb_stats = venc_stats["backbone"]
    proj = venc_params["projection"]

    # --- calibration on normalized frames -------------------------------------------
    # Run-once host job: keep it on CPU — the calibration walk dispatches many eager
    # ops with host syncs, which is pathological on remote/tunneled TPUs.
    try:
        calib_device = jax.devices("cpu")[0]
    except RuntimeError:
        calib_device = jax.devices()[0]
    # tpu_cnn's VALID patch-embed stem admits the exact uint8 input fold (the int8
    # analogue of ops/fold.py): no f32 normalize pass, stem consumes u8−128 directly.
    input_fold = cfg.model.video_backbone.startswith("tpu_cnn")
    with jax.default_device(calib_device):
        frames = np.asarray(
            jax.jit(normalize_clip)(calib_clips_u8)
        ).reshape((-1,) + calib_clips_u8.shape[2:4] + (3,))
        act_stats = calibrate(bb_params, bb_stats, frames[:64])
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

    def forward(imu_raw, video_u8):
        B, T = video_u8.shape[0], video_u8.shape[1]
        imu = featurize_windows(
            imu_raw, kernel_size=d.median_filter_kernel,
            normalize=d.normalize_imu, racc=d.Racc, rgyro=d.Rgyro,
        )
        if input_fold:
            frames = video_u8.reshape((B * T,) + video_u8.shape[2:])
        else:
            video = normalize_clip(video_u8)
            frames = video.reshape((B * T,) + video.shape[2:])
        feats = quant_forward(q, frames)  # (B*T, feat_dim) f32
        feats = feats.reshape(B, T, -1)
        tokens = feats @ proj["kernel"] + proj["bias"]  # (B, T, video_d_model)
        logits, fused = model.apply(
            variables, imu, tokens, train=False,
            method=FusionClassifier.fuse_with_tokens,
        )
        return {
            "logits": logits,
            "msp": msp_score(logits),
            "energy": energy_score(logits, cfg.ood.energy_temperature),
            "embeddings": fused,
        }

    return forward
