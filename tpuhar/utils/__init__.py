"""Cross-cutting utilities (capability parity with reference ``src/utils.py``).

The reference's helpers are torch-centric (cuDNN seeding, ``get_device`` returning a
torch device, parameter counting over ``model.parameters()``); these are their JAX
equivalents: explicit PRNG-key discipline, ``jax.devices()`` introspection, and PyTree
parameter counting.
"""
from __future__ import annotations

import json
import random
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------------
# Seeding / PRNG discipline (reference utils.py:13-22)
# ---------------------------------------------------------------------------------
def set_seed(seed: int = 42) -> jax.Array:
    """Seed host-side RNGs and return the root JAX PRNG key.

    JAX randomness is functional — the returned key (split per use) is the real
    reproducibility mechanism; numpy/python seeding covers host-side sampling
    (manifest shuffles, few-shot subset draws).
    """
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


# ---------------------------------------------------------------------------------
# Devices (reference utils.py:187-199)
# ---------------------------------------------------------------------------------
def get_devices(platform: Optional[str] = None):
    """Return available accelerator devices, preferring TPU."""
    try:
        return jax.devices(platform) if platform else jax.devices()
    except RuntimeError:
        return jax.devices("cpu")


def describe_devices() -> str:
    devs = get_devices()
    kinds = {}
    for d in devs:
        kinds[d.device_kind] = kinds.get(d.device_kind, 0) + 1
    return ", ".join(f"{n}x {k}" for k, n in kinds.items())


# ---------------------------------------------------------------------------------
# Model introspection (reference utils.py:25-47)
# ---------------------------------------------------------------------------------
def count_parameters(params) -> int:
    """Count parameters in a PyTree (reference counts trainable torch params)."""
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)))


def param_bytes(params) -> int:
    return int(
        sum(np.prod(x.shape) * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params))
    )


def print_model_info(name: str, params) -> None:
    n = count_parameters(params)
    print(f"{name}: {n:,} parameters ({param_bytes(params) / 1e6:.2f} MB)")


# ---------------------------------------------------------------------------------
# Dataset path validation (reference utils.py:202-239)
# ---------------------------------------------------------------------------------
def check_dataset_paths(config) -> Dict[str, bool]:
    """Validate the raw-dataset layout; the video dir is optional (utils.py:234-237)."""
    base = Path(config.paths.base_input)
    status = {
        "base_input": base.exists(),
        "train_file": (base / config.paths.train_file).exists(),
        "val_file": (base / config.paths.val_file).exists(),
        "test_file": (base / config.paths.test_file).exists(),
        "sensor_dir": (base / config.paths.sensor_dir).exists(),
        "video_dir": (base / config.paths.video_dir).exists(),  # optional
    }
    required = [k for k in status if k != "video_dir"]
    status["ok"] = all(status[k] for k in required)
    return status


# ---------------------------------------------------------------------------------
# Timing / meters (reference utils.py:242-315)
# ---------------------------------------------------------------------------------
class AverageMeter:
    """Running mean tracker (reference utils.py:282-299)."""

    def __init__(self, name: str = ""):
        self.name = name
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val: float, n: int = 1) -> None:
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def format_time(seconds: float) -> str:
    """Human-readable duration (reference utils.py:302-315)."""
    seconds = float(seconds)
    if seconds < 60:
        return f"{seconds:.1f}s"
    if seconds < 3600:
        return f"{int(seconds // 60)}m {seconds % 60:.0f}s"
    return f"{int(seconds // 3600)}h {int((seconds % 3600) // 60)}m"


def estimate_training_time(steps_per_epoch: int, epochs: int, secs_per_step: float) -> str:
    """Back-of-envelope ETA (reference utils.py:242-258)."""
    return format_time(steps_per_epoch * epochs * secs_per_step)


class StepTimer:
    """Per-step wall-clock timer with warmup exclusion, for throughput reporting."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times = []
        self._t0 = None
        self._step = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        dt = time.perf_counter() - self._t0
        self._step += 1
        if self._step > self.warmup:
            self._times.append(dt)

    @property
    def mean(self) -> float:
        return float(np.mean(self._times)) if self._times else 0.0

    @property
    def p50(self) -> float:
        return float(np.median(self._times)) if self._times else 0.0


# ---------------------------------------------------------------------------------
# Results / reporting helpers (reference utils.py:50-146, 261-279)
# ---------------------------------------------------------------------------------
def save_config(config, path) -> None:
    config.save(path)


def create_results_summary(results: dict, path) -> None:
    """Persist a JSON results summary (reference utils.py:261-279)."""
    with open(path, "w") as f:
        json.dump(results, f, indent=2, default=_json_default)


def _json_default(o):
    if isinstance(o, (np.floating, np.integer)):
        return o.item()
    if isinstance(o, (np.ndarray, jnp.ndarray)):
        return np.asarray(o).tolist()
    return str(o)


def format_metric_table(metrics: Dict[str, float], title: str = "") -> str:
    """Simple console metric table (reference utils.py:123-132)."""
    lines = []
    if title:
        lines.append(title)
    width = max((len(k) for k in metrics), default=0)
    for k, v in metrics.items():
        lines.append(f"  {k:<{width}} : {v:8.3f}")
    return "\n".join(lines)
