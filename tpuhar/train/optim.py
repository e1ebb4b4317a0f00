"""Optimizers and LR schedules (optax), mirroring the reference's recipes.

Reference recipes (``src/train/trainer.py``):
- Pretraining: AdamW(lr=1e-4, wd=0.01) with LinearLR warmup (start_factor 0.1 over
  ``pretrain_warmup_epochs``) → CosineAnnealing to 1e-6, stepped per epoch, plus a
  warmup=0 guard (``trainer.py:74-105``).
- Classification: AdamW wd=``pretrain_weight_decay``; linear-probe trains the head only
  at ``train_lr_head`` (``trainer.py:255-263``); finetune uses two param groups —
  encoder at ``train_lr_encoder``, head at ``train_lr_head`` (``trainer.py:265-279``) —
  with Cosine to 1e-7 (``trainer.py:281-285``).
- Global-norm gradient clipping at 1.0 on every path (``trainer.py:139``, ``:304``).

TPU-first deltas: schedules are per-*step* (smooth, computed from ``steps_per_epoch``)
rather than per-epoch staircases, and parameter-group routing uses
``optax.multi_transform`` over the param tree — the frozen encoder gets
``set_to_zero``, so "freezing" is an optimizer property, not parameter mutation.
"""
from __future__ import annotations

import optax


def pretrain_schedule(config, steps_per_epoch: int) -> optax.Schedule:
    """Linear warmup (0.1→1.0 × lr) then cosine decay to 1e-6."""
    t = config.training
    lr = float(t.pretrain_lr)
    warmup_steps = int(t.pretrain_warmup_epochs) * steps_per_epoch
    total_steps = max(int(t.pretrain_epochs) * steps_per_epoch, 1)
    decay_steps = max(total_steps - warmup_steps, 1)
    cosine = optax.cosine_decay_schedule(
        init_value=lr, decay_steps=decay_steps, alpha=1e-6 / lr
    )
    if warmup_steps <= 0:  # warmup=0 guard (trainer.py:84-90)
        return cosine
    warmup = optax.linear_schedule(
        init_value=0.1 * lr, end_value=lr, transition_steps=warmup_steps
    )
    return optax.join_schedules([warmup, cosine], boundaries=[warmup_steps])


def classification_schedule(base_lr: float, config, steps_per_epoch: int) -> optax.Schedule:
    """Cosine decay from ``base_lr`` to 1e-7 over ``train_epochs``."""
    total = max(int(config.training.train_epochs) * steps_per_epoch, 1)
    return optax.cosine_decay_schedule(
        init_value=base_lr, decay_steps=total, alpha=1e-7 / max(base_lr, 1e-12)
    )


def make_pretrain_optimizer(config, steps_per_epoch: int) -> optax.GradientTransformation:
    t = config.training
    return optax.chain(
        optax.clip_by_global_norm(float(t.grad_clip_norm)),
        optax.adamw(
            pretrain_schedule(config, steps_per_epoch),
            weight_decay=float(t.pretrain_weight_decay),
        ),
    )


def _param_group_labels(params) -> dict:
    """Label top-level param subtrees: 'encoder' for the IMU encoder, 'head' otherwise."""
    import jax

    def label_subtree(name):
        return "encoder" if name == "imu_encoder" else "head"

    return {
        name: jax.tree_util.tree_map(lambda _: label_subtree(name), subtree)
        for name, subtree in params.items()
    }


def make_classification_optimizer(
    config, steps_per_epoch: int, mode: str, params
) -> optax.GradientTransformation:
    """Probe: encoder updates zeroed; finetune: per-group LRs — both clip@1.0 + AdamW."""
    t = config.training
    wd = float(t.pretrain_weight_decay)
    head_tx = optax.adamw(
        classification_schedule(float(t.train_lr_head), config, steps_per_epoch),
        weight_decay=wd,
    )
    if mode == "linear_probe":
        enc_tx: optax.GradientTransformation = optax.set_to_zero()
    elif mode == "finetune":
        enc_tx = optax.adamw(
            classification_schedule(float(t.train_lr_encoder), config, steps_per_epoch),
            weight_decay=wd,
        )
    else:
        raise ValueError(f"Unknown classification mode: {mode}")
    return optax.chain(
        optax.clip_by_global_norm(float(t.grad_clip_norm)),
        optax.multi_transform(
            {"encoder": enc_tx, "head": head_tx}, _param_group_labels(params)
        ),
    )
