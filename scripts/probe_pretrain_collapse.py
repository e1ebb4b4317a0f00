#!/usr/bin/env python
"""Pick an InfoNCE pretrain lr that does NOT collapse on the hard fixture.

The r4 article chip runs pretrained at pretrain_lr=5e-4 and produced an IMU
representation with per-dim std 0.046 at mean norm 11.3 (between-sample
variance 0.2%% of norm² — collapsed), which made every pretrained arm score at
or below the scratch control.  This CPU probe sweeps pretrain lr on the same
hard fixture at probe scale (tiny_cnn video tower, 32², so a cell is minutes)
and reports, per lr:
  - embedding collapse metrics (per-dim std, var/norm²) on val windows
  - a sklearn linear-probe bal-acc on the val embeddings (train on half,
    test on half — a fast transfer proxy)

Run: python scripts/probe_pretrain_collapse.py [epochs=10]
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
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    import pandas as pd

    from tpuhar.cli import Pipeline
    from tpuhar.data.synthetic import make_synthetic_config
    from tpuhar.models.imu import build_imu_encoder

    work = Path("outputs/article_hard")
    results = {}
    for lr in (5e-4, 2e-4, 1e-4, 5e-5):
        cfg = make_synthetic_config(
            work / "data", Path(f"outputs/probe_pt/lr{lr:.0e}"),
            num_classes=6, video_backbone="tiny_cnn", video_resize=(32, 32),
            pretrain_epochs=epochs, pretrain_batch_size=64,
        )
        cfg.data.video_frames_per_window = 4
        cfg.model.compute_dtype = "float32"
        cfg.model.head_norm = "layer"
        cfg.training.pretrain_lr = lr
        # reuse the already-preprocessed windows/frames: point preprocessed dir
        # at the article workdir (fingerprint-compatible — same data dir)
        cfg.paths.preprocessed_dir = work / "out" / "preprocessed"
        pipe = Pipeline(cfg)
        pipe.run_pretraining()
        enc_params, _ = pipe._load_pretrained_encoder()
        assert enc_params is not None

        md = pd.read_csv(work / "out" / "preprocessed" / "val_metadata.csv")
        W = np.load(work / "out" / "preprocessed" / "val_windows.npy")
        lab = md["label"].values
        enc = build_imu_encoder(cfg)
        F = np.asarray(
            enc.apply({"params": enc_params}, W.transpose(0, 2, 1), train=False)[0]
        )
        Fc = F - F.mean(0)
        var = float((Fc**2).sum(1).mean())
        norm2 = float((F**2).sum(1).mean())
        from sklearn.linear_model import LogisticRegression
        from sklearn.metrics import balanced_accuracy_score

        # stratified split — the metadata is class-ordered, so a positional
        # half-split trains and tests on DISJOINT classes (bal-acc 0)
        idx = np.random.default_rng(0).permutation(len(F))
        n = len(F) // 2
        tr_i, te_i = idx[:n], idx[n:]
        clf = LogisticRegression(max_iter=2000).fit(F[tr_i], lab[tr_i])
        bal = balanced_accuracy_score(lab[te_i], clf.predict(F[te_i])) * 100
        results[f"{lr:.0e}"] = {
            "perdim_std": round(float(F.std(0).mean()), 4),
            "var_over_norm2": round(var / max(norm2, 1e-9), 5),
            "sk_probe_heldout_bal": round(bal, 2),
        }
        log(f"lr={lr:.0e}: perdim_std {results[f'{lr:.0e}']['perdim_std']}, "
            f"var/norm2 {results[f'{lr:.0e}']['var_over_norm2']}, "
            f"sk-probe held-out bal {bal:.1f}")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
