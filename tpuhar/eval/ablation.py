"""Ablation harness: train/evaluate a grid of config variants → ``ablation_results.csv``.

The reference's Table 5 machinery reads an ``ablation_results.csv`` that no code ever
writes (``generate_tables.py:279-300``, SURVEY §6).  This harness produces it: each
named ablation is a set of dotted config overrides applied to a base config; the
variant trains an IMU classifier end-to-end and reports test metrics.

Default grid covers the framework's encoder/featurizer axes (the north-star configs):
raw-patch transformer, STFT transformer, 1D-CNN, and the quirk-replication mode.
"""
from __future__ import annotations

import copy
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import pandas as pd

from ..data.loader import BatchLoader
from ..train.factory import build_classification_task
from ..train.loop import ClassificationTrainer
from .evaluator import Evaluator

DEFAULT_ABLATIONS: List[Tuple[str, Dict[str, object]]] = [
    ("transformer_raw", {}),
    ("transformer_stft", {"data.imu_featurizer": "stft"}),
    ("cnn_raw", {"model.imu_encoder": "cnn"}),
    ("transformer_raw_q1_truncation", {"model.replicate_pos_truncation": True}),
    ("no_normalization", {"data.normalize_imu": False}),
]


def _apply_overrides(config, overrides: Dict[str, object]):
    cfg = copy.deepcopy(config)
    for dotted, value in overrides.items():
        section, key = dotted.split(".", 1)
        setattr(getattr(cfg, section), key, value)
    return cfg


def run_ablations(
    config,
    train_df: pd.DataFrame,
    val_df: pd.DataFrame,
    test_df: pd.DataFrame,
    ablations: Optional[List[Tuple[str, Dict[str, object]]]] = None,
    rng=None,
    verbose: bool = True,
) -> pd.DataFrame:
    """Train each ablation variant from scratch (finetune recipe) and evaluate on test.

    Note ``data.*`` featurization overrides here affect the *model-side* features
    (e.g. STFT is computed inside the encoder from the stored windows); offline
    window artifacts are shared across variants.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(config.training.seed)
    rows = []
    for name, overrides in ablations or DEFAULT_ABLATIONS:
        cfg = _apply_overrides(config, overrides)
        rng, init_rng, fit_rng = jax.random.split(rng, 3)
        bs = min(cfg.training.train_batch_size, max(len(train_df), 1))
        spe = max(len(train_df) // bs, 1)
        task = build_classification_task(cfg, "finetune", spe, init_rng, batch_size=bs)
        trainer = ClassificationTrainer(
            cfg, task.state, task.train_step, task.eval_step,
            Path(cfg.paths.checkpoints_dir) / f"ablation_{name}", fit_rng, "finetune",
        )
        trainer.verbose = False
        task.state = trainer.fit(
            BatchLoader(
                train_df, cfg, mode="classification", batch_size=bs,
                shuffle=True, drop_last=True, seed=cfg.training.seed, prefetch=0,
            ),
            BatchLoader(val_df, cfg, mode="classification", prefetch=0),
        )
        from ..train import checkpoint as ckpt

        best = trainer.save_dir / "best_model"
        if ckpt.checkpoint_exists(best):
            task.state, _ = ckpt.restore_checkpoint(best, task.state)
        metrics = Evaluator(task, cfg).evaluate(
            BatchLoader(test_df, cfg, mode="classification", prefetch=0)
        )["metrics"]
        rows.append({"config": name, **metrics})
        if verbose:
            print(
                f"[Ablation] {name}: bal_acc={metrics['balanced_accuracy']:.2f}",
                flush=True,
            )
    return pd.DataFrame(rows)
