"""Zero-shot IMU classification via the cross-modal embedding space (Table 4 content).

The reference ships Table-4 *rendering* that reads a ``zeroshot_results.json`` no code
ever writes (``generate_tables.py:90-124``, ``:252-274`` — SURVEY §6).  This module
produces that artifact for real: after SigLIP pretraining, video clips of each class
form class prototypes in the shared projection space, and IMU windows are classified
by nearest prototype — no labels touched by the IMU tower.

Prototype construction uses *train*-split videos (one forward pass each); evaluation
classifies *test*-split IMU windows.  Both run as batched jitted programs.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..data.loader import BatchLoader
from ..eval.metrics import confusion_update, init_confusion, metrics_from_confusion
from ..models.layers import l2_normalize


def compute_class_prototypes(task, train_df: pd.DataFrame, config) -> np.ndarray:
    """Mean L2-normalized video embedding per class: ``(num_classes, proj_dim)``."""
    from ..ops.video import normalize_clip

    C = config.model.num_classes
    model, state = task.model, task.state

    @jax.jit
    def embed_videos(state, video_u8):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.zeros(
                (video_u8.shape[0], config.data.imu_channels, config.data.imu_window_size)
            ),
            normalize_clip(video_u8),
            train=False,
        )
        return out["video_proj"]

    sums = np.zeros((C, config.model.projection_dim), np.float64)
    counts = np.zeros((C,), np.int64)
    loader = BatchLoader(train_df, config, mode="cross_modal", prefetch=2)
    for batch in loader:
        n = int(batch["n_valid"])
        proj = np.asarray(embed_videos(state, jnp.asarray(batch["video"])))[:n]
        labels = train_df.iloc[np.asarray(batch["idx"])[:n]]["label"].to_numpy()
        np.add.at(sums, labels, proj)
        np.add.at(counts, labels, 1)
    protos = sums / np.maximum(counts[:, None], 1)
    protos = protos / np.maximum(np.linalg.norm(protos, axis=1, keepdims=True), 1e-12)
    return protos.astype(np.float32)


def zero_shot_evaluate(
    task, prototypes: np.ndarray, test_df: pd.DataFrame, config
) -> Dict[str, float]:
    """Classify test IMU windows by nearest class prototype; sklearn-exact metrics."""
    model, state = task.model, task.state
    protos = jnp.asarray(prototypes)
    C = config.model.num_classes
    H, W = config.data.video_resize
    T = config.data.video_frames_per_window

    @jax.jit
    def classify(state, imu):
        # black video placeholder — only the IMU tower's projection is consumed
        dummy_video = jnp.zeros((imu.shape[0], T, H, W, 3), jnp.float32)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            imu, dummy_video, train=False,
        )
        sims = l2_normalize(out["imu_proj"]) @ protos.T  # (B, C)
        return jnp.argmax(sims, axis=-1)

    cm = init_confusion(C)
    loader = BatchLoader(test_df, config, mode="classification", prefetch=2)
    for batch in loader:
        preds = classify(state, jnp.asarray(batch["imu"]))
        valid = jnp.arange(preds.shape[0]) < batch["n_valid"]
        cm = confusion_update(cm, jnp.asarray(batch["label"]), preds, valid)
    return metrics_from_confusion(cm)


def run_zero_shot(
    task, train_df, test_df, config, save_path: Optional[Path] = None
) -> Dict[str, Dict[str, float]]:
    """Full zero-shot pass; writes the ``zeroshot_results.json`` Table 4 consumes."""
    protos = compute_class_prototypes(task, train_df, config)
    metrics = zero_shot_evaluate(task, protos, test_df, config)
    results = {"video_prototype_zeroshot": metrics}
    if save_path is not None:
        Path(save_path).write_text(json.dumps(results, indent=2))
    return results
