#!/usr/bin/env python
"""TPU-vs-CPU parity of the cross-modal pretrain step (the r4/r5 stall hunt).

Evidence so far: on the coupled hard-fixture pool, CPU f32 training drives val
InfoNCE 4.16 -> 0.08 by ~epoch 15, while the SAME code on the chip sits pinned
at ln(64)=4.159 — both before (r4 queueG) and after (r5 P0) the
``jax.default_matmul_precision("float32")`` pretrain wrapper.  So the wrapper
either doesn't bite, or the divergence isn't matmul precision at all.

This probe removes every moving part except device compute: ONE process, the
SAME preprocessed pool data, the SAME init params and rng streams, the SAME
deterministically-ordered batches — then K optimization steps per arm:

  cpu_f32        steps jitted onto the host CPU device (the known-good arm)
  tpu_default    steps on the TPU at default matmul precision (bf16 passes)
  tpu_f32ctx     steps on the TPU traced under default_matmul_precision('float32')
  tpu_f32params  like tpu_f32ctx (independent trace; control for trace order)

Per-arm: the loss trajectory + the global grad-norm at step 0.  If
tpu_f32ctx tracks cpu_f32, the step math is fine and the stall lives in the
training loop's data path; if it tracks tpu_default instead, the wrapper is
ineffective and the divergence is device numerics beyond matmul precision.

Run ON the TPU (expects the article run's pool on disk):
  python scripts/debug_pretrain_parity.py [steps=40] [workdir=outputs/article_hard_r5]
"""
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    work = Path(sys.argv[2] if len(sys.argv) > 2 else "outputs/article_hard_r5")

    from tpuhar.data.loader import create_dataloaders
    from tpuhar.data.synthetic import make_synthetic_config
    from tpuhar.cli import Pipeline
    from tpuhar.train.factory import build_crossmodal_task
    from tpuhar.train.steps import make_crossmodal_steps

    pool = work / "pool"
    assert (pool / "out" / "preprocessed").exists(), f"no pool at {pool}"
    cfg = make_synthetic_config(
        pool / "data", pool / "out",
        num_classes=6, video_backbone="tiny_cnn", video_resize=(32, 32),
        pretrain_epochs=30, pretrain_batch_size=64,
    )
    cfg.data.video_frames_per_window = 4
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    cfg.training.pretrain_lr = 2e-4
    cfg.training.seed = 0

    pipe = Pipeline(cfg)
    train_df = pipe._metadata("train")
    val_df = pipe._metadata("val")
    loaders = create_dataloaders(cfg, train_df, val_df, val_df, mode="cross_modal")

    # deterministic batch sequence, captured ONCE on the host
    batches = []
    it = iter(loaders["train"])
    while len(batches) < steps:
        try:
            b = next(it)
        except StopIteration:
            it = iter(loaders["train"])
            continue
        batches.append({k: np.asarray(v) for k, v in b.items()})
    log(f"captured {len(batches)} batches "
        f"(imu {batches[0]['imu'].shape}, video {batches[0]['video'].shape})")

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        task = build_crossmodal_task(cfg, len(loaders["train"]), jax.random.PRNGKey(0))
    # host-resident copy: the donated train_step would otherwise delete the
    # shared init state's buffers after the first arm (device_put to the same
    # device aliases rather than copies)
    state0 = jax.device_get(task.state)
    rngs = jax.random.split(jax.random.PRNGKey(42), steps)

    from tpuhar.models.crossmodal import CrossModalModel

    def run_arm(device, precision_ctx):
        model = CrossModalModel(cfg, train_loss_scalars=bool(
            cfg.training.train_loss_scalars))
        import contextlib

        ctx = (jax.default_matmul_precision(precision_ctx)
               if precision_ctx else contextlib.nullcontext())
        with ctx:
            train_step, _ = make_crossmodal_steps(model, cfg)
            state = jax.device_put(state0, device)
            losses = []
            grad0 = None
            for i, b in enumerate(batches):
                db = {k: jax.device_put(v, device) for k, v in b.items()}
                if i == 0:
                    # grad norm at the shared init, same batch, this device
                    import jax.numpy as jnp

                    import tpuhar.losses as L
                    from tpuhar.ops.video import normalize_clip

                    def loss_fn(params):
                        variables = {"params": params}
                        if state.batch_stats:
                            variables["batch_stats"] = state.batch_stats
                        out = model.apply(
                            variables, db["imu"], normalize_clip(db["video"]),
                            train=False,
                        )
                        return L.infonce_loss(
                            out["imu_proj"], out["video_proj"],
                            float(cfg.training.temperature))

                    g = jax.jit(jax.grad(loss_fn))(state.params)
                    grad0 = float(
                        jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                                     for x in jax.tree_util.tree_leaves(g))))

                    # constant-embedding pathology check at init: per-dim std
                    # across the batch for both projections
                    def fwd(params):
                        variables = {"params": params}
                        if state.batch_stats:
                            variables["batch_stats"] = state.batch_stats
                        from tpuhar.ops.video import normalize_clip as nc
                        return model.apply(
                            variables, db["imu"], nc(db["video"]), train=False)

                    o = jax.jit(fwd)(state.params)
                    emb_stats = {
                        k: round(float(jnp.std(o[k], axis=0).mean()), 6)
                        for k in ("imu_proj", "video_proj")
                    }
                state, metrics = train_step(state, db, jax.device_put(rngs[i], device))
                losses.append(float(metrics["loss"]))
        return losses, grad0, emb_stats

    arms = {}
    platform = jax.devices()[0].platform
    arms["cpu_f32"] = run_arm(cpu, None)
    if platform != "cpu":
        tpu = jax.devices()[0]
        arms["tpu_default"] = run_arm(tpu, None)
        arms["tpu_f32ctx"] = run_arm(tpu, "float32")
        arms["tpu_highest"] = run_arm(tpu, "highest")

        # ---- pipeline-faithful arms: the REAL loop stalls while the arms
        # above learn, so replicate the pipeline's remaining deltas — its key
        # stream and its init DEVICE (the pipeline inits on the TPU; the
        # probe and the learning CPU pipeline both init on CPU) -------------
        def pipeline_faithful(init_on_cpu: bool):
            pipe2 = Pipeline(cfg)
            k_init = pipe2._next_key()
            k_train = pipe2._next_key()
            import contextlib

            dev_ctx = (jax.default_device(cpu) if init_on_cpu
                       else contextlib.nullcontext())
            with dev_ctx:
                task2 = build_crossmodal_task(
                    cfg, len(loaders["train"]), k_init)
            # init-params diagnostics: global norm + the init-batch loss
            pnorm = float(jnp.sqrt(sum(
                jnp.sum(np.asarray(x, np.float32) ** 2)
                for x in jax.tree_util.tree_leaves(
                    jax.device_get(task2.state.params)))))
            state = jax.device_put(jax.device_get(task2.state), tpu)
            rng = k_train
            losses = []
            for b in batches:
                rng, sub = jax.random.split(rng)
                db = {k: jax.device_put(v, tpu) for k, v in b.items()}
                state, m = task2.train_step(state, db, sub)
                losses.append(float(m["loss"]))
            return losses, pnorm, {}

        arms["tpu_pipe_faithful"] = pipeline_faithful(init_on_cpu=False)
        arms["tpu_pipe_keys_cpuinit"] = pipeline_faithful(init_on_cpu=True)

    out = {"bench": "pretrain_parity", "steps": steps, "arms": {}}
    for name, (losses, g0, emb) in arms.items():
        diag_key = "init_param_norm" if "pipe" in name else "grad_norm_step0"
        out["arms"][name] = {
            diag_key: round(g0, 6) if g0 is not None else None,
            "init_emb_std": emb,
            "loss_first5": [round(x, 4) for x in losses[:5]],
            "loss_last5": [round(x, 4) for x in losses[-5:]],
            "loss_final": round(losses[-1], 4),
        }
        log(f"{name}: grad0={g0} emb_std={emb} first5={losses[:5]} "
            f"last={losses[-1]:.4f}")
    Path("docs/pretrain_parity.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
