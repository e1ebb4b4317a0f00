#!/usr/bin/env python
"""Why does IMU-only classification sit at chance on the hard fixture?

The r4 article-workflow chip runs returned chance on every arm even at the
40-ep/3e-3 convergence budget, yet the preprocessed windows carry clean class
structure (per-class dominant frequency 0.80 -> 1.40 Hz).  The finetune arms
cannot even fit the TRAIN set (17-20%% after 40 ep) while the linear probe's
train acc climbs — an encoder-lr optimization failure signature.

This probe grid-searches (mode, lr) on the EXISTING article workdir
(outputs/article_hard) on CPU and prints final train/val accuracy per cell,
to pick a budget where supervised IMU learning works at all.

Run: python scripts/probe_imu_hard_lr.py [epochs=25]
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

    jax.config.update("jax_platforms", "cpu")
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 25

    from tpuhar.data.loader import create_dataloaders
    from tpuhar.data.synthetic import make_synthetic_config
    from tpuhar.eval.evaluator import Evaluator
    from tpuhar.train.factory import build_classification_task
    from tpuhar.train.loop import ClassificationTrainer

    work = Path("outputs/article_hard")
    cfg = make_synthetic_config(
        work / "data", work / "out", num_classes=6,
        video_backbone="tpu_cnn", video_resize=(64, 64),
        train_epochs=epochs, train_batch_size=32,
    )
    cfg.data.video_frames_per_window = 4
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    cfg.training.patience = epochs + 1

    import pandas as pd

    dfs = tuple(
        pd.read_csv(work / "out" / "preprocessed" / f"{s}_metadata.csv")
        for s in ("train", "val", "test")
    )

    results = {}
    for mode in ("finetune",):
        for lr in (3e-3, 1e-3, 3e-4, 1e-4):
            cfg.training.train_lr_encoder = lr
            cfg.training.train_lr_head = lr
            loaders = create_dataloaders(cfg, *dfs, mode="classification")
            rng = jax.random.PRNGKey(0)
            task = build_classification_task(
                cfg, mode, max(len(loaders["train"]), 1), rng, encoder_params=None
            )
            tr = ClassificationTrainer(
                cfg, task.state, task.train_step, task.eval_step,
                Path("outputs/probe_lr") / f"{mode}_{lr:.0e}", rng, mode,
            )
            tr.verbose = False
            task.state = tr.fit(loaders["train"], loaders["val"])
            hist = json.loads((tr.save_dir / "training_history.json").read_text())
            tacc = [round(e["accuracy"], 1) for e in hist["train"]]
            vacc = [round(e.get("balanced_accuracy", e["accuracy"]), 1) for e in hist["val"]]
            m = Evaluator(task, cfg).evaluate(loaders["test"])["metrics"]
            results[f"{mode}/{lr:.0e}"] = {
                "train_acc_last5": tacc[-5:], "val_bal_last5": vacc[-5:],
                "test_bal": round(float(m["balanced_accuracy"]), 2),
            }
            log(f"{mode} lr={lr:.0e}: train tail {tacc[-5:]} val tail {vacc[-5:]} "
                f"test {results[f'{mode}/{lr:.0e}']['test_bal']}")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
