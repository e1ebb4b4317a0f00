"""Jitted train/eval step factories.

Each factory closes over the model + config and returns a pure, jitted function over
``(state, batch, rng)``.  The whole per-step pipeline — uint8→normalized video, IMU
forward, loss, grads, clip, AdamW update — is one XLA program; there is no per-step
host sync (the reference calls ``.item()`` every step, ``trainer.py:143``).

States are donated so parameter/optimizer buffers update in place in HBM.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from .. import losses as L
from ..ops.augment import augment_imu
from ..ops.video import normalize_clip


class TrainState(struct.PyTreeNode):
    """Minimal train state: params + mutable batch stats + optimizer state."""

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
            opt_state=new_opt_state,
        )


def init_state(model, tx, rng, *example_inputs) -> TrainState:
    variables = model.init(rng, *example_inputs)
    return TrainState.create(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        tx=tx,
    )


def _apply(model, state, *inputs, train: bool, rng=None):
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    rngs = {"dropout": rng} if (train and rng is not None) else None
    if train:
        out, mutated = model.apply(
            variables, *inputs, train=True, mutable=["batch_stats"], rngs=rngs
        )
        return out, mutated.get("batch_stats", state.batch_stats)
    return model.apply(variables, *inputs, train=False), state.batch_stats


# ---------------------------------------------------------------------------------
# Cross-modal pretraining steps
# ---------------------------------------------------------------------------------
def make_crossmodal_steps(model, config):
    """Returns ``(train_step, eval_step)`` for contrastive pretraining.

    Loss selection follows ``use_sigmoid_loss`` (``configs/config.py:116``): SigLIP with
    the model's live scalars, or symmetric InfoNCE at fixed ``temperature``.
    """
    t = config.training
    use_sigmoid = bool(t.use_sigmoid_loss)
    quirk = bool(t.replicate_siglip_sign_quirk)
    temperature = float(t.temperature)

    def contrastive_loss(out, n_valid=None):
        if use_sigmoid:
            return L.siglip_loss(
                out["imu_proj"],
                out["video_proj"],
                out["logit_scale"],
                out["logit_bias"],
                quirk_sign_flip=quirk,
                n_valid=n_valid,
            )
        return L.infonce_loss(
            out["imu_proj"], out["video_proj"], temperature, n_valid=n_valid
        )

    augment = bool(config.data.use_augmentation)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        video = normalize_clip(batch["video"])
        aug_rng, rng = jax.random.split(rng)
        imu = augment_imu(batch["imu"], aug_rng, config) if augment else batch["imu"]

        def loss_fn(params):
            out, new_bs = _apply(
                model, state.replace(params=params), imu, video,
                train=True, rng=rng,
            )
            return contrastive_loss(out), new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return new_state, {"loss": loss}

    @jax.jit
    def eval_step(state: TrainState, batch: Dict) -> Dict:
        video = normalize_clip(batch["video"])
        out, _ = _apply(model, state, batch["imu"], video, train=False)
        # zero-padded final val batches: mask padded rows out of the pair matrix
        return {
            "loss": contrastive_loss(out, n_valid=batch.get("n_valid")),
            "n_valid": batch.get(
                "n_valid", jnp.asarray(batch["imu"].shape[0], jnp.int32)
            ),
        }

    return train_step, eval_step


# ---------------------------------------------------------------------------------
# Classification steps
# ---------------------------------------------------------------------------------
def classification_step_fns(model, config):
    """Un-jitted ``(train_step, predict_step)`` — composable under vmap (the parallel
    few-shot harness vmaps these over a run axis before jitting)."""

    augment = bool(config.data.use_augmentation)

    def train_step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        aug_rng, rng = jax.random.split(rng)
        imu = augment_imu(batch["imu"], aug_rng, config) if augment else batch["imu"]

        def loss_fn(params):
            (logits, _), new_bs = _apply(
                model, state.replace(params=params), imu, train=True, rng=rng
            )
            return L.cross_entropy_loss(logits, batch["label"]), (new_bs, logits)

        (loss, (new_bs, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        acc = jnp.mean((jnp.argmax(logits, -1) == batch["label"]).astype(jnp.float32))
        return new_state, {"loss": loss, "accuracy": acc * 100.0}

    def predict_step(state: TrainState, batch: Dict) -> Dict:
        (logits, emb), _ = _apply(model, state, batch["imu"], train=False)
        labels = batch.get("label", jnp.zeros(logits.shape[0], jnp.int32))
        loss_per = L.cross_entropy_loss(logits, labels, reduction="none")
        valid = jnp.arange(logits.shape[0]) < batch["n_valid"]
        return {
            "logits": logits,
            "embeddings": emb,
            "preds": jnp.argmax(logits, -1),
            "loss_sum": jnp.sum(loss_per * valid),
            "valid": valid,
        }

    return train_step, predict_step


def make_classification_steps(model, config, num_classes: Optional[int] = None):
    """Jitted ``(train_step, predict_step)`` for IMU classification.

    ``predict_step`` emits per-window logits — the fidelity surface BASELINE.json names —
    plus embeddings for OOD scoring; metric accumulation happens on the confusion
    matrix (``tpuhar.eval.metrics``), not per-batch sklearn calls.
    """
    train_step, predict_step = classification_step_fns(model, config)
    return (
        jax.jit(train_step, donate_argnums=(0,)),
        jax.jit(predict_step),
    )


# ---------------------------------------------------------------------------------
# Video-only classifier steps (BASELINE "video-only clip encoder" config)
# ---------------------------------------------------------------------------------
def make_video_steps(model, config):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        video = normalize_clip(batch["video"])

        def loss_fn(params):
            (logits, _), new_bs = _apply(
                model, state.replace(params=params), video, train=True, rng=rng
            )
            return L.cross_entropy_loss(logits, batch["label"]), (new_bs, logits)

        (loss, (new_bs, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        acc = jnp.mean((jnp.argmax(logits, -1) == batch["label"]).astype(jnp.float32))
        return new_state, {"loss": loss, "accuracy": acc * 100.0}

    @jax.jit
    def predict_step(state: TrainState, batch: Dict) -> Dict:
        video = normalize_clip(batch["video"])
        (logits, emb), _ = _apply(model, state, video, train=False)
        labels = batch.get("label", jnp.zeros(logits.shape[0], jnp.int32))
        loss_per = L.cross_entropy_loss(logits, labels, reduction="none")
        valid = jnp.arange(logits.shape[0]) < batch["n_valid"]
        return {
            "logits": logits,
            "embeddings": emb,
            "preds": jnp.argmax(logits, -1),
            "loss_sum": jnp.sum(loss_per * valid),
            "valid": valid,
        }

    return train_step, predict_step


# ---------------------------------------------------------------------------------
# Fusion classifier steps (IMU + video, north-star)
# ---------------------------------------------------------------------------------
def make_fusion_steps(model, config):
    augment = bool(config.data.use_augmentation)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        video = normalize_clip(batch["video"])
        aug_rng, rng = jax.random.split(rng)
        imu = augment_imu(batch["imu"], aug_rng, config) if augment else batch["imu"]

        def loss_fn(params):
            (logits, _), new_bs = _apply(
                model, state.replace(params=params), imu, video,
                train=True, rng=rng,
            )
            return L.cross_entropy_loss(logits, batch["label"]), (new_bs, logits)

        (loss, (new_bs, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        acc = jnp.mean((jnp.argmax(logits, -1) == batch["label"]).astype(jnp.float32))
        return new_state, {"loss": loss, "accuracy": acc * 100.0}

    @jax.jit
    def predict_step(state: TrainState, batch: Dict) -> Dict:
        video = normalize_clip(batch["video"])
        (logits, emb), _ = _apply(model, state, batch["imu"], video, train=False)
        labels = batch.get("label", jnp.zeros(logits.shape[0], jnp.int32))
        loss_per = L.cross_entropy_loss(logits, labels, reduction="none")
        valid = jnp.arange(logits.shape[0]) < batch["n_valid"]
        return {
            "logits": logits,
            "embeddings": emb,
            "preds": jnp.argmax(logits, -1),
            "loss_sum": jnp.sum(loss_per * valid),
            "valid": valid,
        }

    return train_step, predict_step
