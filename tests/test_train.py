"""Training subsystem: schedules, param-group routing, loop behavior, checkpointing,
and a real end-to-end learning test on the synthetic fixture."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuhar.config import Config
from tpuhar.data.loader import BatchLoader
from tpuhar.data.preprocess import Preprocessor
from tpuhar.models.crossmodal import IMUClassifier
from tpuhar.train import checkpoint as ckpt
from tpuhar.train.loop import ClassificationTrainer, EarlyStopper
from tpuhar.train.optim import (
    classification_schedule,
    make_classification_optimizer,
    make_pretrain_optimizer,
    pretrain_schedule,
)
from tpuhar.train.steps import init_state, make_classification_steps

KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------------------------------
# Schedules
# ---------------------------------------------------------------------------------
def test_pretrain_schedule_shape():
    cfg = Config()
    spe = 10
    sched = pretrain_schedule(cfg, spe)
    lr = cfg.training.pretrain_lr
    assert abs(float(sched(0)) - 0.1 * lr) < 1e-9  # warmup start_factor 0.1
    warm_end = cfg.training.pretrain_warmup_epochs * spe
    assert abs(float(sched(warm_end)) - lr) < 1e-7
    total = cfg.training.pretrain_epochs * spe
    assert float(sched(total)) <= 1e-6 + 1e-9  # cosine floor eta_min=1e-6


def test_pretrain_schedule_zero_warmup_guard():
    cfg = Config()
    cfg.training.pretrain_warmup_epochs = 0
    sched = pretrain_schedule(cfg, 5)
    assert abs(float(sched(0)) - cfg.training.pretrain_lr) < 1e-9


def test_classification_schedule_floor():
    cfg = Config()
    sched = classification_schedule(1e-3, cfg, 7)
    assert abs(float(sched(0)) - 1e-3) < 1e-9
    assert float(sched(cfg.training.train_epochs * 7)) <= 1.1e-7


# ---------------------------------------------------------------------------------
# Param-group routing (probe freezes encoder at the optimizer level)
# ---------------------------------------------------------------------------------
def _tiny_cls_cfg():
    cfg = Config()
    cfg.model.num_classes = 4
    cfg.model.imu_num_layers = 1
    cfg.model.imu_d_model = 32
    cfg.model.imu_nhead = 4
    cfg.model.classifier_hidden_dims = [16]
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    return cfg


def _make_state(cfg, mode, freeze):
    model = IMUClassifier(cfg, freeze_encoder=freeze)
    imu = jnp.zeros((4, 6, 250))
    variables = model.init(KEY, imu)
    tx = make_classification_optimizer(cfg, 5, mode, variables["params"])
    state = init_state(model, tx, KEY, imu)
    return model, state


@pytest.mark.parametrize("mode,freeze", [("linear_probe", True), ("finetune", False)])
def test_probe_freezes_encoder_params(rng, mode, freeze):
    cfg = _tiny_cls_cfg()
    model, state = _make_state(cfg, mode, freeze)
    train_step, _ = make_classification_steps(model, cfg)
    batch = {
        "imu": jnp.asarray(rng.normal(size=(4, 6, 250)).astype(np.float32)),
        "label": jnp.asarray([0, 1, 2, 3]),
        "n_valid": jnp.asarray(4),
    }
    before = jax.device_get(state.params["imu_encoder"])
    head_before = jax.device_get(state.params["classifier"])
    state2, metrics = train_step(state, batch, KEY)  # donates `state`
    after = jax.device_get(state2.params["imu_encoder"])
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), before, after
    )
    max_diff = max(jax.tree_util.tree_leaves(diffs))
    if mode == "linear_probe":
        assert max_diff == 0.0
    else:
        assert max_diff > 0.0
    # head always moves
    head_after = jax.device_get(state2.params["classifier"])
    hd = max(
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda a, b: float(np.abs(a - b).max()), head_before, head_after)
        )
    )
    assert hd > 0.0
    assert np.isfinite(float(metrics["loss"]))


# ---------------------------------------------------------------------------------
# Early stopping
# ---------------------------------------------------------------------------------
def test_early_stopper_min_mode():
    s = EarlyStopper(patience=2, mode="min", min_delta=0.01)
    assert s.update(1.0)
    assert not s.update(0.995)  # within min_delta → not improved
    assert s.counter == 1
    assert s.update(0.9)
    assert s.counter == 0
    s.update(0.91)
    s.update(0.92)
    assert s.should_stop


def test_early_stopper_max_mode():
    s = EarlyStopper(patience=1, mode="max")
    s.update(50.0)
    assert not s.update(50.0)
    assert s.should_stop


# ---------------------------------------------------------------------------------
# Checkpoint round-trip
# ---------------------------------------------------------------------------------
def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = _tiny_cls_cfg()
    model, state = _make_state(cfg, "finetune", False)
    batch = {
        "imu": jnp.asarray(rng.normal(size=(4, 6, 250)).astype(np.float32)),
        "label": jnp.asarray([0, 1, 2, 3]),
        "n_valid": jnp.asarray(4),
    }
    train_step, _ = make_classification_steps(model, cfg)
    state, _ = train_step(state, batch, KEY)

    ckpt.save_checkpoint(tmp_path / "ck", state, extra={"epoch": 3, "note": "x"})
    # fresh state, then restore
    _, fresh = _make_state(cfg, "finetune", False)
    restored, extra = ckpt.restore_checkpoint(tmp_path / "ck", fresh)
    assert extra["epoch"] == 3
    assert int(restored.step) == int(state.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state.params)),
        jax.tree_util.tree_leaves(jax.device_get(restored.params)),
    ):
        np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------------
# End-to-end: the classifier actually learns the synthetic task
# ---------------------------------------------------------------------------------
def test_classification_learns_synthetic(synthetic_config):
    cfg = synthetic_config
    cfg.model.imu_num_layers = 2
    cfg.model.imu_d_model = 64
    cfg.model.imu_nhead = 4
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    cfg.model.classifier_dropout = 0.1
    cfg.training.train_epochs = 25
    cfg.training.train_lr_head = 3e-3
    # The reference finetune recipe (encoder @1e-6) presumes a pretrained encoder;
    # this test trains from scratch, so give the encoder a real LR.
    cfg.training.train_lr_encoder = 1e-3
    cfg.training.train_batch_size = 8  # ~4 steps/epoch on the tiny fixture

    pp = Preprocessor(cfg)
    dfs = {s: pp.preprocess_split(s, save=True) for s in ("train", "val")}

    model = IMUClassifier(cfg, freeze_encoder=False)
    imu_example = jnp.zeros((cfg.training.train_batch_size, 6, 250))
    variables = model.init(KEY, imu_example)
    spe = max(len(dfs["train"]) // cfg.training.train_batch_size, 1)
    tx = make_classification_optimizer(cfg, spe, "finetune", variables["params"])
    state = init_state(model, tx, KEY, imu_example)

    train_step, predict_step = make_classification_steps(model, cfg)
    trainer = ClassificationTrainer(
        cfg, state, train_step, predict_step,
        cfg.paths.checkpoints_dir / "classifier_finetune", KEY, "finetune",
    )
    trainer.verbose = False
    train_loader = BatchLoader(
        dfs["train"], cfg, mode="classification", shuffle=True, drop_last=True,
        seed=0, prefetch=0,
    )
    val_loader = BatchLoader(dfs["val"], cfg, mode="classification", prefetch=0)
    trainer.fit(train_loader, val_loader)

    assert trainer.best_metric > 60.0, f"balanced acc {trainer.best_metric}"
    # artifacts
    assert (trainer.save_dir / "best_model.msgpack").exists()
    assert (trainer.save_dir / "training_history.json").exists()
    # history structure matches reference: list of dicts for classification
    assert isinstance(trainer.history["val"][0], dict)
    assert "balanced_accuracy" in trainer.history["val"][0]


def test_trainer_resume_continues_from_epoch(synthetic_config, rng):
    """fit → interrupt → fit(resume=True) continues from the next epoch with history."""
    cfg = synthetic_config
    cfg.model.imu_num_layers = 1
    cfg.model.imu_d_model = 32
    cfg.model.imu_nhead = 4
    cfg.model.classifier_hidden_dims = [16]
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    cfg.training.train_epochs = 2
    cfg.training.train_batch_size = 8

    from tpuhar.data.preprocess import Preprocessor

    pp = Preprocessor(cfg)
    dfs = {s: pp.preprocess_split(s, save=True) for s in ("train", "val")}

    def make_trainer():
        model = IMUClassifier(cfg, freeze_encoder=False)
        ex = jnp.zeros((8, 6, 250))
        variables = model.init(KEY, ex)
        tx = make_classification_optimizer(cfg, 2, "finetune", variables["params"])
        state = init_state(model, tx, KEY, ex)
        ts, ps = make_classification_steps(model, cfg)
        tr = ClassificationTrainer(
            cfg, state, ts, ps,
            cfg.paths.checkpoints_dir / "resume_test", KEY, "finetune",
        )
        tr.verbose = False
        return tr

    loaders = dict(
        train=BatchLoader(dfs["train"], cfg, mode="classification", batch_size=8,
                          shuffle=True, drop_last=True, prefetch=0),
        val=BatchLoader(dfs["val"], cfg, mode="classification", batch_size=8, prefetch=0),
    )
    t1 = make_trainer()
    t1.fit(loaders["train"], loaders["val"])  # runs epochs 0..1
    assert len(t1.history["val"]) == 2

    # "interrupted" second phase: extend epochs, resume from last checkpoint
    cfg.training.train_epochs = 4
    t2 = make_trainer()
    t2.fit(loaders["train"], loaders["val"], resume=True)
    assert t2.current_epoch == 3  # resumed at 2, ran 2 and 3
    assert len(t2.history["val"]) == 4  # history carried over + extended
