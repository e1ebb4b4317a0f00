#!/usr/bin/env python
"""Run the REAL Pipeline.run_pretraining on the chip, instrumented (stall hunt).

debug_pretrain_parity.py showed every replicated ingredient of the pretrain
loop LEARNS on the TPU (step math, pipeline key stream, TPU-executed init,
epoch-0 batch order: loss 0.17 -> 0.08 in 40 steps), while the real
``pipe.run_pretraining()`` — twice, r4 and r5 — sits pinned at ln 64.  So the
difference hides inside the real call path.  This script calls the REAL
function on the REAL pool config with per-batch loss logging patched into
``CrossModalTrainer.train_epoch``, 2 epochs.

Run ON the TPU: python scripts/debug_pretrain_loop.py [workdir]
"""
import json
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax

    work = Path(sys.argv[1] if len(sys.argv) > 1 else "outputs/article_hard_r5")
    pool = work / "pool"

    from tpuhar.data.synthetic import make_synthetic_config
    from tpuhar.cli import Pipeline
    from tpuhar.train import loop as train_loop

    cfg = make_synthetic_config(
        pool / "data", pool / "out",
        num_classes=6, video_backbone="tiny_cnn", video_resize=(32, 32),
        pretrain_epochs=2, pretrain_batch_size=64,
    )
    cfg.data.video_frames_per_window = 4
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    cfg.training.pretrain_lr = 2e-4
    cfg.training.seed = 0
    cfg.training.patience = 5

    # keep the article run's (collapsed) checkpoint for the record
    ck = pool / "out" / "checkpoints" / "cross_modal"
    if ck.exists() and not (ck.parent / "cross_modal_article_r5").exists():
        shutil.copytree(ck, ck.parent / "cross_modal_article_r5")

    # per-batch instrumentation on the REAL trainer
    orig = train_loop.CrossModalTrainer.train_epoch

    def train_epoch(self, loader):
        losses = []
        first = []
        for batch in loader:
            self.state, metrics = self.train_step(
                self.state, self._shard(batch), self._next_rng()
            )
            l = float(jax.device_get(metrics["loss"]))
            losses.append(l)
            if len(first) < 5:
                first.append(round(l, 4))
                log(f"  [instrument] batch {len(losses)-1}: loss={l:.4f} "
                    f"imu={np.asarray(batch['imu']).shape} "
                    f"video={np.asarray(batch['video']).shape} "
                    f"keys={sorted(batch.keys())}")
        log(f"  [instrument] epoch first5={first} mean={np.mean(losses):.4f}")
        return float(np.mean(losses))

    train_loop.CrossModalTrainer.train_epoch = train_epoch
    pipe = Pipeline(cfg)
    trainer = pipe.run_pretraining()
    hist = trainer.history
    out = {
        "bench": "pretrain_loop_instrumented",
        "train": [round(float(x), 4) for x in hist["train"]],
        "val": [round(float(x), 4) for x in hist["val"]],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
