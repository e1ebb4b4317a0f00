"""Task factories: assemble model + state + jitted steps + trainer for each stage.

The reference wires these ad hoc inside ``main.py`` / ``evaluator.py``; centralizing the
assembly keeps encoder transplanting (pretrained cross-modal → classifier) explicit and
pure: parameters are PyTrees, so "loading the pretrained encoder" is a dict graft, with
no ``module.``-prefix surgery (``main.py:159-162``) and no shared-object mutation
(quirk Q5 — the reference reuses one encoder object across all 40 few-shot runs).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..models.crossmodal import (
    CrossModalModel,
    FusionClassifier,
    IMUClassifier,
    VideoClassifier,
)
from .optim import make_classification_optimizer, make_pretrain_optimizer
from .steps import (
    TrainState,
    make_classification_steps,
    make_crossmodal_steps,
    make_fusion_steps,
)


@dataclass
class Task:
    model: Any
    state: TrainState
    train_step: Callable
    eval_step: Callable  # predict_step for classification/fusion


def _graft(params, key: str, subtree):
    """Replace ``params[key]`` with ``subtree`` (pure; no shared mutation)."""
    out = dict(params)
    out[key] = subtree
    return out


def example_imu(config, batch: Optional[int] = None):
    d = config.data
    b = batch or config.training.train_batch_size
    return jnp.zeros((b, d.imu_channels, d.imu_window_size), jnp.float32)


def example_video(config, batch: Optional[int] = None):
    d = config.data
    b = batch or config.training.pretrain_batch_size
    H, W = d.video_resize
    return jnp.zeros((b, d.video_frames_per_window, H, W, 3), jnp.uint8)


def _maybe_shard(state, mesh):
    if mesh is None:
        return state
    from ..parallel.mesh import shard_state

    return shard_state(state, mesh)


def _maybe_graft_video(params, batch_stats, config):
    """Graft local pretrained video weights when configured (reference: backbones
    load pretrained at construction, ``models.py:154-173``)."""
    m = config.model
    path = getattr(m, "video_weights_path", None)
    if not path:
        return params, batch_stats
    if not bool(m.video_pretrained):
        print(
            "[factory] model.video_weights_path set but video_pretrained=False - "
            "skipping graft"
        )
        return params, batch_stats
    from ..models.convert import graft_model_video_weights

    params, batch_stats = graft_model_video_weights(params, batch_stats, config)
    print(f"[factory] grafted pretrained video weights from {path}")
    return params, batch_stats


def build_crossmodal_task(config, steps_per_epoch: int, rng, *, mesh=None) -> Task:
    model = CrossModalModel(
        config, train_loss_scalars=bool(config.training.train_loss_scalars)
    )
    b = config.training.pretrain_batch_size
    imu, video = example_imu(config, b), example_video(config, b)
    # init consumes normalized float video; shape is what matters
    variables = model.init(rng, imu, video.astype(jnp.float32))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    params, batch_stats = _maybe_graft_video(params, batch_stats, config)
    tx = make_pretrain_optimizer(config, steps_per_epoch)
    state = TrainState.create(params=params, batch_stats=batch_stats, tx=tx)
    state = _maybe_shard(state, mesh)
    train_step, eval_step = make_crossmodal_steps(model, config)
    return Task(model, state, train_step, eval_step)


def build_classification_task(
    config,
    mode: str,
    steps_per_epoch: int,
    rng,
    *,
    encoder_params=None,
    encoder_batch_stats=None,
    batch_size: Optional[int] = None,
    mesh=None,
) -> Task:
    """Build a probe/finetune classifier, optionally grafting a pretrained IMU encoder."""
    model = IMUClassifier(config, freeze_encoder=(mode == "linear_probe"))
    imu = example_imu(config, batch_size)
    variables = model.init(rng, imu)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if encoder_params is not None:
        params = _graft(params, "imu_encoder", encoder_params)
    if encoder_batch_stats is not None and "imu_encoder" in dict(batch_stats or {}):
        batch_stats = _graft(batch_stats, "imu_encoder", encoder_batch_stats)
    tx = make_classification_optimizer(config, steps_per_epoch, mode, params)
    state = TrainState.create(params=params, batch_stats=batch_stats, tx=tx)
    state = _maybe_shard(state, mesh)
    train_step, predict_step = make_classification_steps(model, config)
    return Task(model, state, train_step, predict_step)


def build_video_task(
    config, steps_per_epoch: int, rng, *, batch_size: Optional[int] = None, mesh=None
) -> Task:
    """Video-only clip classifier (BASELINE config); trains with the fusion recipe."""
    from .steps import make_video_steps

    b = batch_size or config.training.pretrain_batch_size
    model = VideoClassifier(config)
    video = example_video(config, b)
    variables = model.init(rng, video.astype(jnp.float32))
    params, batch_stats = _maybe_graft_video(
        variables["params"], variables.get("batch_stats", {}), config
    )
    tx = make_classification_optimizer(config, steps_per_epoch, "finetune", params)
    state = _maybe_shard(
        TrainState.create(params=params, batch_stats=batch_stats, tx=tx),
        mesh,
    )
    train_step, predict_step = make_video_steps(model, config)
    return Task(model, state, train_step, predict_step)


def build_fusion_task(
    config,
    steps_per_epoch: int,
    rng,
    *,
    encoder_params=None,
    batch_size: Optional[int] = None,
    mesh=None,
) -> Task:
    """North-star fusion classifier; ``encoder_params`` grafts a pretrained IMU encoder."""
    b = batch_size or config.training.pretrain_batch_size
    model = FusionClassifier(config)
    imu, video = example_imu(config, b), example_video(config, b)
    variables = model.init(rng, imu, video.astype(jnp.float32))
    params = variables["params"]
    if encoder_params is not None:
        params = _graft(params, "imu_encoder", encoder_params)
    params, batch_stats = _maybe_graft_video(
        params, variables.get("batch_stats", {}), config
    )
    tx = make_classification_optimizer(config, steps_per_epoch, "finetune", params)
    state = _maybe_shard(
        TrainState.create(params=params, batch_stats=batch_stats, tx=tx),
        mesh,
    )
    train_step, predict_step = make_fusion_steps(model, config)
    return Task(model, state, train_step, predict_step)
