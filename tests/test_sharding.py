"""Multi-chip sharding on the 8-device fake CPU mesh: dp + tp train steps run and
produce finite losses; TP params are actually sharded."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tpuhar.config import Config
from tpuhar.models.crossmodal import FusionClassifier, IMUClassifier
from tpuhar.parallel.mesh import (
    create_mesh,
    partition_specs,
    shard_batch,
    shard_state,
)
from tpuhar.train.optim import make_classification_optimizer
from tpuhar.train.steps import TrainState, init_state, make_classification_steps, make_fusion_steps

KEY = jax.random.PRNGKey(0)


def _cfg():
    cfg = Config()
    cfg.model.num_classes = 4
    cfg.model.imu_num_layers = 2
    cfg.model.imu_d_model = 64
    cfg.model.imu_nhead = 4
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    cfg.model.video_backbone = "videomae_tiny"
    cfg.model.video_d_model = 64
    cfg.model.fusion_heads = 4
    cfg.data.video_resize = (32, 32)
    cfg.data.video_frames_per_window = 4
    return cfg


def test_eight_fake_devices_present():
    assert len(jax.devices()) == 8


def test_tp_partition_specs_match_rules():
    cfg = _cfg()
    model = IMUClassifier(cfg)
    params = model.init(KEY, jnp.zeros((4, 6, 250)))["params"]
    mesh = create_mesh(model_axis_size=2)
    specs = partition_specs(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    by_path = {"/".join(str(k.key) for k in kp): s for kp, s in flat}
    # torch-style block: linear1 column-parallel, linear2 row-parallel
    assert by_path["imu_encoder/block0/linear1/kernel"] == P(None, "model")
    assert by_path["imu_encoder/block0/linear2/kernel"] == P("model", None)
    assert by_path["imu_encoder/block0/self_attn/query/kernel"] == P(None, "model", None)
    # patch embed replicated
    assert by_path["imu_encoder/patch_embed/kernel"] == P()


@pytest.mark.parametrize("model_axis_size", [1, 2])
def test_sharded_classification_step(model_axis_size, rng):
    cfg = _cfg()
    mesh = create_mesh(model_axis_size=model_axis_size)
    model = IMUClassifier(cfg)
    B = 16
    imu = jnp.zeros((B, 6, 250))
    variables = model.init(KEY, imu)
    tx = make_classification_optimizer(cfg, 4, "finetune", variables["params"])
    state = init_state(model, tx, KEY, imu)
    state = shard_state(state, mesh)

    if model_axis_size > 1:
        # verify a TP param is actually distributed over the model axis
        k = state.params["imu_encoder"]["block0"]["linear1"]["kernel"]
        assert k.sharding.spec == P(None, "model")

    batch = shard_batch(
        {
            "imu": rng.normal(size=(B, 6, 250)).astype(np.float32),
            "label": rng.integers(0, 4, size=B).astype(np.int32),
            "n_valid": np.int32(B),
        },
        mesh,
    )
    assert batch["imu"].sharding.spec == P("data")

    train_step, predict_step = make_classification_steps(model, cfg)
    state2, metrics = train_step(state, batch, KEY)
    assert np.isfinite(float(metrics["loss"]))
    # params keep their sharding through the update
    k2 = state2.params["imu_encoder"]["block0"]["linear1"]["kernel"]
    if model_axis_size > 1:
        assert k2.sharding.spec == P(None, "model")
    out = predict_step(state2, batch)
    assert np.asarray(out["logits"]).shape == (B, 4)


def test_sharded_fusion_step(rng):
    """Full dp+tp fusion train step — the dryrun_multichip path."""
    cfg = _cfg()
    mesh = create_mesh(model_axis_size=2)
    model = FusionClassifier(cfg)
    B = 8
    imu = jnp.zeros((B, 6, 250))
    video = jnp.zeros((B, 4, 32, 32, 3), jnp.float32)
    variables = model.init(KEY, imu, video)
    tx = make_classification_optimizer(cfg, 2, "finetune", variables["params"])
    state = TrainState.create(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
    state = shard_state(state, mesh)
    batch = shard_batch(
        {
            "imu": rng.normal(size=(B, 6, 250)).astype(np.float32),
            "video": (rng.random((B, 4, 32, 32, 3)) * 255).astype(np.uint8),
            "label": rng.integers(0, 4, size=B).astype(np.int32),
            "n_valid": np.int32(B),
        },
        mesh,
    )
    train_step, _ = make_fusion_steps(model, cfg)
    state2, metrics = train_step(state, batch, KEY)
    assert np.isfinite(float(metrics["loss"]))


def test_data_parallel_matches_single_device(rng):
    """The dp-sharded step computes the same loss as the unsharded step."""
    cfg = _cfg()
    model = IMUClassifier(cfg)
    B = 8
    imu_np = rng.normal(size=(B, 6, 250)).astype(np.float32)
    labels_np = rng.integers(0, 4, size=B).astype(np.int32)
    imu = jnp.zeros((B, 6, 250))
    variables = model.init(KEY, imu)
    tx = make_classification_optimizer(cfg, 2, "finetune", variables["params"])

    def run(sharded):
        state = init_state(model, tx, KEY, imu)
        batch = {
            "imu": imu_np, "label": labels_np, "n_valid": np.int32(B),
        }
        if sharded:
            mesh = create_mesh(model_axis_size=1)
            state = shard_state(state, mesh)
            batch = shard_batch(batch, mesh)
        train_step, _ = make_classification_steps(model, cfg)
        _, metrics = train_step(state, batch, KEY)
        return float(metrics["loss"])

    assert abs(run(False) - run(True)) < 1e-5
