#!/usr/bin/env python
"""Rescore trained hard-fixture LOO checkpoints with ALL OOD scores (msp, energy,
Mahalanobis, kNN, relative-Mahalanobis) — forward passes only, no training.

The hard fixture (scripts/bench_accuracy.py --difficulty hard) showed logit-space
scores (msp/energy) collapsing below 0.5 AUROC for every tower and raw Mahalanobis
separating the towers.  This script answers "do the embedding-space additions
(tpuhar.ood.KNNScorer / RelativeMahalanobisScorer) recover detection quality?" on
the SAME trained checkpoints, the deployment-consistent protocol: every scorer is
fitted on id-train embeddings served through the same forward that scores id/ood
test windows.

The reference repo has no OOD code at all (SURVEY.md §7); msp/energy/mahalanobis
are the north-star's named scores (BASELINE.md) and knn/rmd are the beyond-parity
additions this validates.

Usage:
  python scripts/rescore_ood_hard.py [--root outputs/bench_accuracy_hard]
      [--towers tpu_cnn,resnet18,videomae_small] [--classes 0,2,4] [--tpu]
      [--out docs/ood_rescore_hard.json]

CPU works for tpu_cnn/resnet18 (~minutes/class); use --tpu for videomae or the
full sweep (one process on the chip at a time — CLAUDE.md).
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="outputs/bench_accuracy_hard")
    p.add_argument("--towers", default="tpu_cnn,resnet18,videomae_small")
    p.add_argument("--classes", default="0,2,4")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--knn-k", type=int, default=10)
    p.add_argument("--tpu", action="store_true", help="run on the TPU (default CPU)")
    p.add_argument(
        "--limit", type=int, default=0,
        help="cap windows per split (CPU smoke only — AUROCs are not comparable)",
    )
    p.add_argument("--out", default="docs/ood_rescore_hard.json")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import pandas as pd

    log(f"devices: {jax.devices()}")

    from tpuhar.data.loader import BatchLoader
    from tpuhar.data.synthetic import make_synthetic_config
    from tpuhar.models.crossmodal import FusionClassifier
    from tpuhar.eval.metrics import auroc
    from tpuhar.ood import (
        KNNScorer,
        MahalanobisScorer,
        RelativeMahalanobisScorer,
        compute_ood_scores,
        fpr_at_tpr,
        leave_one_out_split,
    )
    from tpuhar.ops.video import normalize_clip
    from tpuhar.train import checkpoint as ckpt
    from tpuhar.train.factory import build_fusion_task

    root = Path(args.root)
    dfs = {
        split: pd.read_csv(root / "preprocessed" / f"{split}_metadata.csv")
        for split in ("train", "test")
    }
    score_names = ["msp", "energy", "mahalanobis", "knn", "rmd"]
    classes = [int(x) for x in args.classes.split(",")]

    all_rows = []
    for tower in args.towers.split(","):
        # identical config construction to scripts/bench_accuracy.py::build_config
        cfg = make_synthetic_config(
            root / "fixture", root / tower,
            num_classes=6, video_backbone=tower,
            video_resize=(224, 224), train_batch_size=args.batch,
        )
        cfg.data.video_frames_per_window = 16
        cfg.data.featurize_backend = "host"
        cfg.paths.preprocessed_dir = root / "preprocessed"

        for c in classes:
            ckpt_dir = root / tower / "checkpoints" / f"ood_loo_{c}" / "best_model"
            if not ckpt_dir.with_suffix(".msgpack").exists():
                log(f"[{tower}] missing checkpoint {ckpt_dir} — skipping")
                continue
            t0 = time.perf_counter()
            id_train, _, remap = leave_one_out_split(dfs["train"], c)
            id_test, ood_test, _ = leave_one_out_split(dfs["test"], c, remap=remap)

            import copy

            loo_cfg = copy.deepcopy(cfg)
            loo_cfg.model.num_classes = len(remap)
            model = FusionClassifier(loo_cfg)
            # init on CPU (axon eager ops pay remote compiles — CLAUDE.md)
            with jax.default_device(jax.devices("cpu")[0]):
                task = build_fusion_task(
                    loo_cfg, 1, jax.random.PRNGKey(0), batch_size=args.batch
                )
            state, _ = ckpt.restore_checkpoint(ckpt_dir, task.state)
            variables = {"params": state.params, "batch_stats": state.batch_stats}

            @jax.jit
            def forward(imu, video_u8):
                return model.apply(
                    variables, imu, normalize_clip(video_u8), train=False
                )

            def score_split(df):
                logits, embs, labels = [], [], []
                loader = BatchLoader(
                    df, loo_cfg, mode="fusion", batch_size=args.batch, prefetch=0
                )
                for b in loader:
                    lg, em = forward(b["imu"], b["video"])
                    n = int(b["n_valid"]) if "n_valid" in b else len(lg)
                    logits.append(np.asarray(lg)[:n])
                    embs.append(np.asarray(em)[:n])
                    labels.append(np.asarray(b["label"])[:n])
                return (
                    np.concatenate(logits),
                    np.concatenate(embs),
                    np.concatenate(labels),
                )

            if args.limit:
                id_train = id_train.head(args.limit)
                id_test = id_test.head(args.limit)
                ood_test = ood_test.head(args.limit)
            tr_lg, tr_em, tr_y = score_split(id_train)
            id_lg, id_em, _ = score_split(id_test)
            ood_lg, ood_em, _ = score_split(ood_test)

            scorers = dict(
                mahalanobis=MahalanobisScorer.fit(tr_em, tr_y, len(remap)),
                knn=KNNScorer.fit(tr_em, k=args.knn_k),
                rmd=RelativeMahalanobisScorer.fit(tr_em, tr_y, len(remap)),
            )
            id_s = compute_ood_scores(
                id_lg, id_em, scores=score_names,
                mahalanobis=scorers["mahalanobis"], knn=scorers["knn"],
                rmd=scorers["rmd"],
                energy_temperature=cfg.ood.energy_temperature,
            )
            ood_s = compute_ood_scores(
                ood_lg, ood_em, scores=score_names,
                mahalanobis=scorers["mahalanobis"], knn=scorers["knn"],
                rmd=scorers["rmd"],
                energy_temperature=cfg.ood.energy_temperature,
            )
            row = {"tower": tower, "held_out_class": c}
            for name in score_names:
                s = np.concatenate([id_s[name], ood_s[name]])
                is_ood = np.concatenate(
                    [np.zeros(len(id_s[name])), np.ones(len(ood_s[name]))]
                )
                row[f"auroc_{name}"] = round(float(auroc(s, is_ood)), 4)
                row[f"fpr95_{name}"] = round(float(fpr_at_tpr(s, is_ood)), 4)
            row["wall_s"] = round(time.perf_counter() - t0, 1)
            all_rows.append(row)
            log(f"[{tower}] class {c}: "
                + "  ".join(f"{n}={row[f'auroc_{n}']}" for n in score_names)
                + f"  ({row['wall_s']}s)")

    # per-tower means + markdown table
    out = {"rows": all_rows, "knn_k": args.knn_k, "mean_by_tower": {}}
    lines = [
        "| tower | " + " | ".join(f"AUROC {n}" for n in score_names) + " |",
        "|---|" + "---|" * len(score_names),
    ]
    for tower in args.towers.split(","):
        rows = [r for r in all_rows if r["tower"] == tower]
        if not rows:
            continue
        means = {
            n: round(float(np.mean([r[f"auroc_{n}"] for r in rows])), 3)
            for n in score_names
        }
        out["mean_by_tower"][tower] = means
        lines.append(
            f"| {tower} | " + " | ".join(str(means[n]) for n in score_names) + " |"
        )
    md = "\n".join(lines)
    print(md)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
