"""Checkpointing: PyTree state ↔ msgpack files with the reference's last/best/periodic
policy.

The reference stores ``{epoch, model_state_dict, history, best_*, optimizer_state_dict,
scheduler_state_dict}`` via ``torch.save`` (``src/train/trainer.py:38-56``) and needs
``module.``-prefix stripping for DataParallel checkpoints (``main.py:159-162``).  JAX
states are plain PyTrees — serialization is ``flax.serialization`` msgpack, sharding is
irrelevant to the on-disk format, and no prefix surgery exists.

Each checkpoint is a pair: ``<name>.msgpack`` (arrays: params / batch_stats / opt_state)
plus ``<name>.json`` (epoch, history, best metrics — human-inspectable, like the
reference's ``training_history.json``).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization


def save_checkpoint(path, state, extra: Optional[Dict[str, Any]] = None) -> None:
    """Serialize a TrainState (or any PyTree) + JSON sidecar."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    path.with_suffix(".msgpack").write_bytes(
        serialization.to_bytes(jax.device_get(payload))
    )
    sidecar = dict(extra or {})
    path.with_suffix(".json").write_text(json.dumps(sidecar, indent=2, default=str))


def restore_checkpoint(path, state) -> Tuple[Any, Dict[str, Any]]:
    """Restore into a template TrainState; returns ``(state, sidecar_dict)``."""
    path = Path(path)
    template = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    restored = serialization.from_bytes(
        template, path.with_suffix(".msgpack").read_bytes()
    )
    new_state = state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    sidecar_path = path.with_suffix(".json")
    extra = json.loads(sidecar_path.read_text()) if sidecar_path.exists() else {}
    return new_state, extra


def save_params(path, params) -> None:
    """Bare parameter dump (reference's ``final_model_state_dict.pt``, ``main.py:112-122``)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(jax.device_get(params)))


def restore_params(path, params_template):
    return serialization.from_bytes(params_template, Path(path).read_bytes())


def checkpoint_exists(path) -> bool:
    return Path(path).with_suffix(".msgpack").exists()
