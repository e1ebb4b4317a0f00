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

Also scores temperature-CALIBRATED msp/energy (``msp_cal``/``energy_cal``): the
temperature is fitted by NLL on the held-out ID *val* split
(``tpuhar.eval.calibration.fit_temperature`` — never test data) and applied as
``logits/T`` before scoring, exactly what ``InferenceEngine(temperature=T)``
serves.  Scaling by a shared T changes per-sample msp/energy *rankings*, so this
measures whether deployment-grade calibration moves softmax-margin OOD quality
on a fixture where those scores struggle; ID-test ECE before/after is reported
alongside.

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
    p.add_argument(
        "--allow-data-mismatch", action="store_true",
        help="skip the checkpoint↔data fingerprint check",
    )
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

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

    from tpuhar.eval.calibration import expected_calibration_error, fit_temperature
    from tpuhar.ood import energy_score, msp_score

    root = Path(args.root)
    dfs = {
        split: pd.read_csv(root / "preprocessed" / f"{split}_metadata.csv")
        for split in ("train", "val", "test")
    }
    score_names = ["msp", "energy", "mahalanobis", "knn", "rmd"]
    cal_names = ["msp_cal", "energy_cal"]
    classes = [int(x) for x in args.classes.split(",")]

    from tpuhar.data.preprocess import FINGERPRINT_FILENAME, verify_data_fingerprint

    all_rows = []
    for tower in args.towers.split(","):
        # refuse to score checkpoints against data they were not trained on
        if not args.allow_data_mismatch:
            verify_data_fingerprint(
                root / tower / "checkpoints" / FINGERPRINT_FILENAME,
                root / "preprocessed",
                context=f"{tower} checkpoints",
            )
        # identical config construction to scripts/bench_accuracy.py::build_config
        saved_cfg = root / tower / "checkpoints" / "config.json"
        if saved_cfg.exists():
            from tpuhar.config import Config

            cfg = Config.load(saved_cfg)
        else:
            cfg = make_synthetic_config(
                root / "fixture", root / tower,
                num_classes=6, video_backbone=tower,
                video_resize=(224, 224), train_batch_size=args.batch,
            )
            cfg.data.video_frames_per_window = 16
        cfg.data.featurize_backend = "host"
        cfg.paths.preprocessed_dir = root / "preprocessed"

        for c in classes:
            # "last" first: trainer.fit returns the last-epoch state, so that is
            # what the head-to-head evaluator scored (see validate_int8_ood.py)
            loo_dir = root / tower / "checkpoints" / f"ood_loo_{c}"
            ckpt_dir = next(
                (
                    loo_dir / n
                    for n in ("last", "best_model")
                    if (loo_dir / n).with_suffix(".msgpack").exists()
                ),
                None,
            )
            if ckpt_dir is None:
                log(f"[{tower}] missing checkpoint under {loo_dir} — skipping")
                continue
            t0 = time.perf_counter()
            id_train, _, remap = leave_one_out_split(dfs["train"], c)
            id_val, _, _ = leave_one_out_split(dfs["val"], c, remap=remap)
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
                id_val = id_val.head(args.limit)
                id_test = id_test.head(args.limit)
                ood_test = ood_test.head(args.limit)
            tr_lg, tr_em, tr_y = score_split(id_train)
            val_lg, _, val_y = score_split(id_val)
            id_lg, id_em, id_y = score_split(id_test)
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
            # calibrated msp/energy: T fitted by NLL on the ID val split served
            # through the same forward — the InferenceEngine(temperature=T)
            # semantics.  Pinned to CPU: tiny arrays, and eager TPU ops pay
            # per-shape remote compiles (CLAUDE.md).
            with jax.default_device(jax.devices("cpu")[0]):
                temp = fit_temperature(val_lg, val_y)
                et = cfg.ood.energy_temperature
                id_s["msp_cal"] = np.asarray(msp_score(jnp.asarray(id_lg / temp)))
                ood_s["msp_cal"] = np.asarray(msp_score(jnp.asarray(ood_lg / temp)))
                id_s["energy_cal"] = np.asarray(
                    energy_score(jnp.asarray(id_lg / temp), et))
                ood_s["energy_cal"] = np.asarray(
                    energy_score(jnp.asarray(ood_lg / temp), et))

            row = {"tower": tower, "held_out_class": c,
                   "temperature": round(float(temp), 3),
                   "ece_id": round(
                       expected_calibration_error(id_lg, id_y)["ece"], 4),
                   "ece_id_cal": round(
                       expected_calibration_error(id_lg / temp, id_y)["ece"], 4)}
            for name in score_names + cal_names:
                s = np.concatenate([id_s[name], ood_s[name]])
                is_ood = np.concatenate(
                    [np.zeros(len(id_s[name])), np.ones(len(ood_s[name]))]
                )
                row[f"auroc_{name}"] = round(float(auroc(s, is_ood)), 4)
                row[f"fpr95_{name}"] = round(float(fpr_at_tpr(s, is_ood)), 4)
            row["wall_s"] = round(time.perf_counter() - t0, 1)
            all_rows.append(row)
            log(f"[{tower}] class {c}: T={row['temperature']} "
                f"ece {row['ece_id']}→{row['ece_id_cal']}  "
                + "  ".join(f"{n}={row[f'auroc_{n}']}"
                            for n in score_names + cal_names)
                + f"  ({row['wall_s']}s)")

    # Merge with any existing artifact: a partial rescore (--towers resnet18)
    # must not clobber previously rescored towers' rows in the shared file.
    rescored = set(args.towers.split(","))
    prev_rows, prev_means = [], {}
    if Path(args.out).exists():
        try:
            prev = json.loads(Path(args.out).read_text())
            prev_rows = [r for r in prev.get("rows", [])
                         if r.get("tower") not in rescored]
            prev_means = {t: m for t, m in prev.get("mean_by_tower", {}).items()
                          if t not in rescored}
        except (json.JSONDecodeError, OSError) as e:
            log(f"could not merge existing {args.out}: {e}")
    all_rows = prev_rows + all_rows

    # per-tower means + markdown table
    all_names = score_names + cal_names
    out = {"rows": all_rows, "knn_k": args.knn_k, "mean_by_tower": prev_means}
    lines = [
        "| tower | " + " | ".join(f"AUROC {n}" for n in all_names) + " |",
        "|---|" + "---|" * len(all_names),
    ]
    for tower in args.towers.split(","):
        rows = [r for r in all_rows if r["tower"] == tower]
        if not rows:
            continue
        means = {
            n: round(float(np.mean([r[f"auroc_{n}"] for r in rows])), 3)
            for n in all_names
        }
        out["mean_by_tower"][tower] = means
        lines.append(
            f"| {tower} | " + " | ".join(str(means[n]) for n in all_names) + " |"
        )
    md = "\n".join(lines)
    print(md)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
