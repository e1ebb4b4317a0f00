#!/usr/bin/env python
"""Training-step throughput: cross-modal pretraining and fusion training on TPU.

Reports clips/sec for the jitted train steps (forward+backward+AdamW), measured with
the chained-loop method.
"""
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from tpuhar.models.crossmodal import CrossModalModel, FusionClassifier
    from tpuhar.ops.featurize import featurize_windows
    from tpuhar.ops.video import normalize_clip
    from tpuhar.train.optim import make_classification_optimizer, make_pretrain_optimizer
    from tpuhar.train.steps import (
        TrainState,
        make_crossmodal_steps,
        make_fusion_steps,
    )

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = _flagship_config()
    d = cfg.data
    H, W = d.video_resize
    T = d.video_frames_per_window
    npr = np.random.default_rng(0)

    def measure(name, model_ctor, steps_ctor, tx_ctor, with_label):
        model = model_ctor()
        with jax.default_device(jax.devices("cpu")[0]):
            variables = jax.jit(
                lambda k, i, v: model.init(k, featurize_windows(i), normalize_clip(v))
            )(
                jax.random.PRNGKey(0),
                np.zeros((1, d.imu_window_size, d.imu_channels), np.float32),
                np.zeros((1, 2, 32, 32, 3), np.uint8),
            )
            tx = tx_ctor(variables["params"])
            state = TrainState(
                step=jnp.zeros((), jnp.int32),
                params=variables["params"],
                batch_stats=variables.get("batch_stats", {}),
                opt_state=jax.jit(tx.init)(variables["params"]),
                tx=tx,
            )
        train_step, _ = steps_ctor(model)

        batch_data = {
            "imu": jax.device_put(
                npr.normal(size=(batch, d.imu_channels, d.imu_window_size)).astype(
                    np.float32
                )
            ),
            "video": jax.device_put(
                (npr.random((batch, T, H, W, 3)) * 255).astype(np.uint8)
            ),
            "n_valid": jax.device_put(np.int32(batch)),
        }
        if with_label:
            batch_data["label"] = jax.device_put(
                npr.integers(0, cfg.model.num_classes, batch).astype(np.int32)
            )

        # chained timing: run K steps serially inside the host loop, relying on the
        # state dependency (each step consumes the previous state) + final readback
        state2, m = train_step(state, batch_data, jax.random.PRNGKey(1))
        float(np.asarray(m["loss"]))  # compile + sync
        t0 = time.perf_counter()
        K = 10
        cur = state2
        for i in range(K):
            cur, m = train_step(cur, batch_data, jax.random.PRNGKey(i))
        float(np.asarray(m["loss"]))
        dt = (time.perf_counter() - t0) / K
        log(f"{name}: {dt * 1e3:8.2f} ms/step  ({batch / dt:7.0f} clips/s)  batch={batch}")

    measure(
        "crossmodal pretrain",
        lambda: CrossModalModel(cfg),
        lambda mdl: make_crossmodal_steps(mdl, cfg),
        lambda params: make_pretrain_optimizer(cfg, 100),
        with_label=False,
    )
    measure(
        "fusion finetune   ",
        lambda: FusionClassifier(cfg),
        lambda mdl: make_fusion_steps(mdl, cfg),
        lambda params: make_classification_optimizer(cfg, 100, "finetune", params),
        with_label=True,
    )


if __name__ == "__main__":
    main()
