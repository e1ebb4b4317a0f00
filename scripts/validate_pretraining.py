#!/usr/bin/env python
"""Validate the cross-modal learning path: SigLIP pretraining must transfer.

On the synthetic fixture (IMU frequency and video tint both encode the class), runs
cross-modal pretraining and compares a linear probe on the pretrained IMU encoder
against a probe on a randomly-initialized encoder. Pretraining helping the probe is
the reference pipeline's core claim; this verifies our implementation delivers it.
"""
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # tiny models; avoids TPU queue

    from tpuhar.cli import Pipeline
    from tpuhar.data.loader import create_dataloaders
    from tpuhar.data.synthetic import generate_synthetic_dataset, make_synthetic_config
    from tpuhar.eval.evaluator import Evaluator
    from tpuhar.train import checkpoint as ckpt
    from tpuhar.train.factory import build_classification_task
    from tpuhar.train.loop import ClassificationTrainer

    tmp = Path(tempfile.mkdtemp(prefix="tpuhar_pretrain_val_"))
    generate_synthetic_dataset(
        tmp / "data", num_classes=4, samples_per_class=6, seq_len=1200, seed=0
    )
    cfg = make_synthetic_config(tmp / "data", tmp / "out")
    cfg.model.imu_num_layers = 2
    cfg.model.imu_d_model = 64
    cfg.model.imu_nhead = 4
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    cfg.model.video_d_model = 64
    cfg.model.projection_dim = 32
    cfg.model.projection_hidden_dim = 64
    cfg.model.classifier_hidden_dims = [32]
    cfg.model.classifier_dropout = 0.0
    cfg.data.video_frames_per_window = 4
    # InfoNCE for small-batch pretraining: SigLIP collapses to the all-negative
    # solution below ~hundreds of samples per batch (see docs/BENCHMARKS.md).
    cfg.training.use_sigmoid_loss = False
    cfg.training.pretrain_epochs = 15
    cfg.training.pretrain_batch_size = 16
    cfg.training.pretrain_warmup_epochs = 2
    cfg.training.pretrain_lr = 5e-4
    cfg.training.train_epochs = 8
    cfg.training.train_batch_size = 16
    cfg.training.train_lr_head = 3e-3

    pipe = Pipeline(cfg)
    pipe.run_preprocessing()
    pipe.run_pretraining()

    train_df, val_df, test_df = (
        pipe._metadata("train"), pipe._metadata("val"), pipe._metadata("test")
    )
    enc_params, enc_bs = pipe._load_pretrained_encoder()
    assert enc_params is not None

    results = {}
    for name, enc in (("pretrained", enc_params), ("random", None)):
        loaders = create_dataloaders(cfg, train_df, val_df, test_df, mode="classification")
        task = build_classification_task(
            cfg, "linear_probe", max(len(loaders["train"]), 1), pipe._next_key(),
            encoder_params=enc,
        )
        trainer = ClassificationTrainer(
            cfg, task.state, task.train_step, task.eval_step,
            Path(cfg.paths.checkpoints_dir) / f"val_probe_{name}",
            pipe._next_key(), "linear_probe",
        )
        trainer.verbose = False
        task.state = trainer.fit(loaders["train"], loaders["val"])
        best = trainer.save_dir / "best_model"
        if ckpt.checkpoint_exists(best):
            task.state, _ = ckpt.restore_checkpoint(best, task.state)
        m = Evaluator(task, cfg).evaluate(loaders["test"])["metrics"]
        results[name] = m["balanced_accuracy"]
        log(f"linear probe ({name:10}): balanced acc {m['balanced_accuracy']:6.2f}")

    delta = results["pretrained"] - results["random"]
    log(f"pretraining transfer delta: {delta:+.2f} points")
    if delta <= 0:
        log("WARNING: pretraining did not help on this run")
    else:
        log("PRETRAINING TRANSFER CONFIRMED")


if __name__ == "__main__":
    main()
