#!/usr/bin/env python
"""Diagnose checkpoint↔data mismatch after a shared-preprocessed regeneration.

Scores the stored ``fusion_full`` checkpoint (trained on an EARLIER
regeneration of ``outputs/bench_accuracy_hard/preprocessed``) against the
CURRENT on-disk windows/frame banks.  Training-time val_bal_acc is recorded in
``training_history.json`` — if the checkpoint scores at that level here, the
regeneration was byte-stable; a collapse means ``run_full_preprocessing()``
is not reproducible across runs and cross-run scoring (validate_int8_ood) is
comparing a model against data it was never trained on.
"""
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import pandas as pd

    from tpuhar.data.loader import BatchLoader
    from tpuhar.data.synthetic import make_synthetic_config
    from tpuhar.models.crossmodal import FusionClassifier
    from tpuhar.ops.video import normalize_clip
    from tpuhar.train import checkpoint as ckpt
    from tpuhar.train.factory import build_fusion_task

    root = Path(sys.argv[1] if len(sys.argv) > 1 else "outputs/bench_accuracy_hard")
    tower = sys.argv[2] if len(sys.argv) > 2 else "tpu_cnn"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 192

    cfg = make_synthetic_config(
        root / "fixture", root / tower,
        num_classes=6, video_backbone=tower,
        video_resize=(224, 224), train_epochs=4, train_batch_size=16,
    )
    cfg.data.video_frames_per_window = 16
    cfg.data.featurize_backend = "host"
    cfg.paths.preprocessed_dir = root / "preprocessed"

    hist = root / tower / "checkpoints" / "fusion_full" / "training_history.json"
    if hist.exists():
        h = json.loads(hist.read_text())
        tail = h[-1] if isinstance(h, list) else h
        print(f"training-time last epoch: { {k: tail[k] for k in tail if 'acc' in k or 'loss' in k} }")

    model = FusionClassifier(cfg)
    with jax.default_device(jax.devices("cpu")[0]):
        task = build_fusion_task(cfg, 1, jax.random.PRNGKey(0), batch_size=16)
    state, _ = ckpt.restore_checkpoint(
        root / tower / "checkpoints" / "fusion_full" / "last", task.state
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    df = pd.read_csv(root / "preprocessed" / "test_metadata.csv").head(n)

    @jax.jit
    def fwd(imu, video_u8):
        return model.apply(variables, imu, normalize_clip(video_u8), train=False)

    preds, labels = [], []
    loader = BatchLoader(df, cfg, mode="fusion", batch_size=16, prefetch=0)
    for b in loader:
        lg, _ = fwd(b["imu"], b["video"])
        k = int(b["n_valid"]) if "n_valid" in b else len(lg)
        preds.append(np.argmax(np.asarray(lg)[:k], 1))
        labels.append(np.asarray(b["label"])[:k])
    preds, labels = np.concatenate(preds), np.concatenate(labels)
    acc = float((preds == labels).mean()) * 100
    print(f"current-data acc over {len(preds)}: {acc:.2f}%")
    cm = np.zeros((6, 6), int)
    for p, l in zip(preds, labels):
        cm[l, p] += 1
    print("confusion (rows=true):")
    print(cm)


if __name__ == "__main__":
    main()
