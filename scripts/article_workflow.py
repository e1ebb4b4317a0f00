#!/usr/bin/env python
"""The reference's article workflow, end-to-end, on the HARD fixture (VERDICT r3 #3).

The reference exists to run: contrastive pretrain → linear probe + finetune →
few-shot grid (Table 3, mean±std over runs) — /root/reference/main.py:275-339,
src/eval/evaluator.py:125-263.  tpuhar has every stage, but pretraining
*usefulness* had only been shown on the saturated easy fixture.  This script
runs the full loop on the discriminative hard fixture — which can say NO — with
a from-scratch control arm for every cell:

  1. hard fixture (class-overlapped IMU + video, optional label noise) → preprocess
  2. cross-modal contrastive pretrain (SigLIP — the reference's loss — by
     default: it trains on this fixture on both platforms, while InfoNCE at
     the default batch/lr/temperature stalls at ln(B) on both; ``--infonce``
     reproduces that negative — docs/BENCHMARKS.md "Article workflow")
  3. FULL-DATA probe: linear_probe + finetune from the pretrained encoder AND
     from random init
  4. FEW-SHOT grid: n_samples × {linear_probe, finetune} × runs, pretrained vs
     scratch, mean ± std per cell + per-cell delta

Artifacts → ``--out`` (default docs/article_hard/): ``article_workflow.json``,
``fewshot_pretrained_raw.csv``, ``fewshot_scratch_raw.csv``, ``summary.md``.

Run on the TPU (hours at the default sizes) or CPU (``--quick`` for a
test-scale pass).  One process: the video tower only trains in stage 2 at 64²
clips, so the axon per-upload RAM leak stays bounded (CLAUDE.md).
"""
from __future__ import annotations

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
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--classes", type=int, default=6)
    p.add_argument("--samples", type=int, default=14, help="sequences per class/split")
    p.add_argument("--resize", type=int, default=64)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--backbone", default="tpu_cnn")
    p.add_argument("--pretrain-epochs", type=int, default=30)
    # Pretraining pool size (sequences/class, separate fixture draw, labels
    # unused): with only the labeled fixture's 14 seqs/class the InfoNCE task
    # memorizes pairs instead of learning structure (chip run: train loss
    # 4.19->1.79 while val EXPLODED 4.14->8.8; IMU embeddings collapsed to
    # per-dim std 0.046).  Pretraining on a larger unlabeled pool is also the
    # reference's actual setting: pretrain on the full dataset, few-shot on
    # scarce labels (/root/reference/main.py:275-339).
    p.add_argument("--pretrain-samples", type=int, default=40)
    # Abort a failing pretrain instead of burning the budget: the r4 chip run
    # kept training ~6 epochs after val InfoNCE started rising (memorization
    # visible at epoch 9 of 15) — VERDICT r4 #7.  CrossModalTrainer's
    # min-val-loss patience implements the stop; 4 epochs of no improvement
    # ends the stage and the result JSON records how many epochs actually ran.
    p.add_argument("--pretrain-patience", type=int, default=4)
    # Budget measured on THIS fixture (scripts/probe_imu_hard_lr.py,
    # docs/probe_imu_hard_lr.json): encoder lr >=1e-3 diverges (train acc
    # pinned at chance), 3e-4 learns, 1e-4 too slow; the head alone is stable
    # at 1e-3.  The reference's finetune defaults (encoder 1e-6 / 12 ep) and
    # the r3 easy-fixture few-shot budget (3e-3 / 40 ep) both fail here.
    p.add_argument("--epochs", type=int, default=60, help="probe/finetune epochs")
    p.add_argument("--lr-encoder", type=float, default=3e-4)
    p.add_argument("--lr-head", type=float, default=1e-3)
    p.add_argument("--pretrain-lr", type=float, default=2e-4)
    p.add_argument("--few-shot-samples", default="2,5,10")
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--label-noise", type=float, default=0.1)
    # Instance-level cross-modal structure (video pulses at the sequence's IMU
    # frequency).  Without it the two modalities share only the class variable,
    # so InfoNCE can only be minimized by pair memorization — measured: train
    # loss 4.19->1.79 with val 4.14->8.8 even at a 40-seq/class pool
    # (docs/article_hard_uncoupled/).  --no-coupling reproduces that honest
    # negative; the default demonstrates transfer where transfer is learnable.
    p.add_argument("--no-coupling", dest="coupling", action="store_false")
    # Pulse-amplitude multiplier for the coupled fixture.  At 1.0 the coupling
    # is UNLEARNABLE (SigLIP retrieval exactly at chance after 30 epochs,
    # InfoNCE pinned at ln B — docs/BENCHMARKS.md); sweep scripts/
    # probe_coupling_strength.py picks the weakest learnable setting.
    p.add_argument("--coupling-strength", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    # SigLIP (the reference's own loss, config.py:116) is the default: on the
    # coupled hard pool it trains on BOTH platforms (loss 0.15 -> 0.08 within
    # one epoch, scripts/debug_pretrain_parity.py), while InfoNCE at this
    # batch/lr/temperature stalls at ln(B) on both — the r4 "CPU generalizes,
    # chip memorizes" contradiction was an artifact of comparing SigLIP CPU
    # numbers against InfoNCE chip numbers (docs/BENCHMARKS.md).  The r1
    # "SigLIP collapses at small batches" finding was the easy fixture +
    # different sizes; it does not transfer here.
    p.add_argument("--sigmoid", action="store_true", default=True,
                   help="use SigLIP for pretraining (default)")
    p.add_argument("--infonce", dest="sigmoid", action="store_false",
                   help="use InfoNCE instead (stalls on this fixture at the "
                        "default batch/lr/temperature — kept for the record)")
    p.add_argument("--out", default="docs/article_hard")
    p.add_argument("--workdir", default="outputs/article_hard",
                   help="fixture + checkpoints live here (gitignored)")
    p.add_argument("--quick", action="store_true",
                   help="tiny CPU smoke: 3 classes, few epochs")
    p.add_argument("--cpu", action="store_true", help="force CPU")
    return p.parse_args()


def build_config(args, work: Path):
    from tpuhar.data.synthetic import generate_synthetic_dataset, make_synthetic_config

    log(f"generating hard fixture: {args.classes} classes × {args.samples} seqs/split, "
        f"label_noise={args.label_noise}")
    generate_synthetic_dataset(
        work / "data",
        num_classes=args.classes,
        samples_per_class=args.samples,
        seq_len=1500,
        seed=args.seed,
        difficulty="hard",
        label_noise=args.label_noise,
        cross_modal_coupling=args.coupling,
        coupling_strength=args.coupling_strength,
    )
    cfg = make_synthetic_config(
        work / "data", work / "out",
        num_classes=args.classes,
        video_backbone=args.backbone,
        video_resize=(args.resize, args.resize),
        pretrain_epochs=args.pretrain_epochs,
        train_epochs=args.epochs,
        pretrain_batch_size=64,
        train_batch_size=32,
        few_shot_samples=[int(s) for s in args.few_shot_samples.split(",")],
        few_shot_runs=args.runs,
    )
    cfg.data.video_frames_per_window = args.frames
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    cfg.training.use_sigmoid_loss = bool(args.sigmoid)
    cfg.training.patience = args.epochs + 1  # matched budget, no early stop
    cfg.training.seed = args.seed
    cfg.training.pretrain_lr = args.pretrain_lr
    cfg.training.train_lr_encoder = args.lr_encoder
    cfg.training.train_lr_head = args.lr_head
    return cfg


def _pool_retrieval(cfg, pool: Path) -> dict:
    """Pair-retrieval accuracy of the trained cross-modal model on the pool's
    val split — the HONEST pretraining telemetry.  Loss values lie: SigLIP's
    dropped 0.15 -> 0.08 on a checkpoint whose retrieval was exactly chance
    (docs/BENCHMARKS.md 'Article workflow'); a pretrain that learned the
    coupling must retrieve the matching clip far above 1/N."""
    import jax
    import numpy as np

    from tpuhar.data.loader import create_dataloaders
    from tpuhar.ops.video import normalize_clip
    from tpuhar.train import checkpoint as ckpt
    from tpuhar.train.factory import build_crossmodal_task
    from tpuhar.cli import Pipeline

    pipe = Pipeline(cfg)
    val_df = pipe._metadata("val")
    loaders = create_dataloaders(cfg, val_df, val_df, val_df, mode="cross_modal")
    with jax.default_device(jax.devices("cpu")[0]):
        task = build_crossmodal_task(cfg, 1, jax.random.PRNGKey(0))
    best = pool / "out" / "checkpoints" / "cross_modal" / "best_model"
    state, _ = ckpt.restore_checkpoint(best, task.state)

    @jax.jit
    def embed(params, bs, imu, video):
        variables = {"params": params}
        if bs:
            variables["batch_stats"] = bs
        out = task.model.apply(variables, imu, normalize_clip(video), train=False)
        return out["imu_proj"], out["video_proj"]

    ip, vp = [], []
    for b in loaders["train"]:
        i, v = embed(state.params, state.batch_stats, b["imu"], b["video"])
        n = int(b.get("n_valid", i.shape[0]))
        ip.append(np.asarray(i)[:n])
        vp.append(np.asarray(v)[:n])
    I, V = np.concatenate(ip), np.concatenate(vp)
    S = I @ V.T
    order = np.argsort(-S, axis=1)
    top1 = float((order[:, 0] == np.arange(len(S))).mean())
    top5 = float((order[:, :5] == np.arange(len(S))[:, None]).any(1).mean())
    return {
        "pairs": int(len(S)),
        "retrieval_top1": round(top1, 4),
        "retrieval_top5": round(top5, 4),
        "chance": round(1.0 / len(S), 5),
        "emb_std_imu": round(float(I.std(0).mean()), 5),
        "emb_std_video": round(float(V.std(0).mean()), 5),
    }


def pretrain_on_pool(args, work: Path):
    """Pretrain on a separate, larger unlabeled pool; return encoder params.

    Mirrors the reference's semi-supervised setting: contrastive pretraining
    sees abundant unlabeled (imu, video) pairs; the labeled fixture stays
    scarce.  The pool is a fresh draw (seed+1000) of the same hard
    distribution, so no labeled-fixture sequence leaks into pretraining."""
    from tpuhar.cli import Pipeline
    from tpuhar.data.synthetic import generate_synthetic_dataset, make_synthetic_config

    pool = work / "pool"
    log(f"generating pretrain pool: {args.classes} classes × {args.pretrain_samples} "
        "seqs/split (labels unused)")
    generate_synthetic_dataset(
        pool / "data",
        num_classes=args.classes,
        samples_per_class=args.pretrain_samples,
        seq_len=1500,
        seed=args.seed + 1000,
        difficulty="hard",
        label_noise=0.0,
        cross_modal_coupling=args.coupling,
        coupling_strength=args.coupling_strength,
    )
    cfg = make_synthetic_config(
        pool / "data", pool / "out",
        num_classes=args.classes,
        video_backbone=args.backbone,
        video_resize=(args.resize, args.resize),
        pretrain_epochs=args.pretrain_epochs,
        pretrain_batch_size=64,
    )
    cfg.data.video_frames_per_window = args.frames
    cfg.model.compute_dtype = "float32"
    cfg.model.head_norm = "layer"
    cfg.training.use_sigmoid_loss = bool(args.sigmoid)
    cfg.training.pretrain_lr = args.pretrain_lr
    cfg.training.seed = args.seed
    cfg.training.patience = args.pretrain_patience
    pipe = Pipeline(cfg)
    t0 = time.perf_counter()
    pipe.run_preprocessing()
    pipe.run_pretraining()
    enc_params, _ = pipe._load_pretrained_encoder()
    assert enc_params is not None, "pool pretraining produced no encoder checkpoint"
    # transfer-quality telemetry: the val InfoNCE trajectory distinguishes
    # learning from pair-memorization (chip history: val 4.14 -> 8.8 = overfit)
    hist_path = pool / "out" / "checkpoints" / "cross_modal" / "training_history.json"
    hist = json.loads(hist_path.read_text()) if hist_path.exists() else {}
    epochs_ran = len(hist.get("train", []))
    info = {
        "wall_s": round(time.perf_counter() - t0, 1),
        "pool_samples_per_class": args.pretrain_samples,
        "epochs_ran": epochs_ran,
        "train_loss": [round(float(x), 3) for x in hist.get("train", [])],
        "val_loss": [round(float(x), 3) for x in hist.get("val", [])],
    }
    if epochs_ran and epochs_ran < args.pretrain_epochs:
        info["early_stopped"] = (
            f"val loss stopped improving for {args.pretrain_patience} epochs "
            f"(ran {epochs_ran}/{args.pretrain_epochs})"
        )
        log(f"pretrain early-stopped: {info['early_stopped']}")
    info["val_retrieval"] = _pool_retrieval(cfg, pool)
    log(f"pool val retrieval: {info['val_retrieval']}")
    return enc_params, info


def full_data_arm(cfg, dfs, enc_params, mode: str, tag: str, rng):
    """Train one full-data classifier (probe or finetune) and return test metrics."""
    from tpuhar.data.loader import create_dataloaders
    from tpuhar.eval.evaluator import Evaluator
    from tpuhar.train import checkpoint as ckpt
    from tpuhar.train.factory import build_classification_task
    from tpuhar.train.loop import ClassificationTrainer
    import jax

    train_df, val_df, test_df = dfs
    loaders = create_dataloaders(cfg, train_df, val_df, test_df, mode="classification")
    init_rng, fit_rng = jax.random.split(rng)
    with jax.default_device(jax.devices("cpu")[0]):
        task = build_classification_task(
            cfg, mode, max(len(loaders["train"]), 1), init_rng,
            encoder_params=enc_params,
        )
    trainer = ClassificationTrainer(
        cfg, task.state, task.train_step, task.eval_step,
        Path(cfg.paths.checkpoints_dir) / f"article_{mode}_{tag}", fit_rng, mode,
    )
    trainer.verbose = False
    task.state = trainer.fit(loaders["train"], loaders["val"])
    best = trainer.save_dir / "best_model"
    if ckpt.checkpoint_exists(best):
        task.state, _ = ckpt.restore_checkpoint(best, task.state)
    m = Evaluator(task, cfg).evaluate(loaders["test"])["metrics"]
    return {k: round(float(m[k]), 2) for k in ("balanced_accuracy", "accuracy", "f1_macro")}


def main():
    args = parse_args()
    if args.quick:
        args.classes, args.samples = 3, 6
        args.pretrain_epochs, args.epochs = 4, 3
        args.pretrain_samples = 8
        args.few_shot_samples, args.runs = "2,4", 2
        args.backbone, args.resize, args.frames = "tiny_cnn", 32, 2
        args.cpu = True
        if args.out == "docs/article_hard":  # don't clobber the real artifact
            args.out = "outputs/article_quick"
        if args.workdir == "outputs/article_hard":
            args.workdir = "outputs/article_quick_work"

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tpuhar.cli import Pipeline
    from tpuhar.eval.evaluator import FewShotEvaluator
    from tpuhar.eval.fewshot_parallel import run_parallel_fewshot

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    cfg = build_config(args, work)
    result = {
        # full resolved invocation (VERDICT r4 weak #3: the r4 chip artifact
        # recorded pool size + epochs but not lr/batch/seed, so the
        # CPU-generalizes-vs-chip-memorizes contradiction couldn't even be
        # diagnosed from the JSON)
        "resolved_args": {k: str(v) if isinstance(v, Path) else v
                          for k, v in vars(args).items()},
        "resolved_training": {
            "pretrain_lr": cfg.training.pretrain_lr,
            "pretrain_batch_size": cfg.training.pretrain_batch_size,
            "train_batch_size": cfg.training.train_batch_size,
            "train_lr_encoder": cfg.training.train_lr_encoder,
            "train_lr_head": cfg.training.train_lr_head,
            "seed": cfg.training.seed,
            "compute_dtype": cfg.model.compute_dtype,
            "pretrain_matmul_precision": "float32 (explicit context)",
        },
        "fixture": {
            "difficulty": "hard", "coupled": bool(args.coupling),
            "classes": args.classes,
            "samples_per_class_split": args.samples,
            "label_noise": args.label_noise, "seed": args.seed,
        },
        "pretrain": {
            "loss": "siglip" if args.sigmoid else "infonce",
            "epochs": args.pretrain_epochs, "backbone": args.backbone,
            "clip": [args.frames, args.resize, args.resize],
        },
        "budget": {"epochs": args.epochs, "few_shot_runs": args.runs},
    }

    pipe = Pipeline(cfg)
    t0 = time.perf_counter()
    pipe.run_preprocessing()
    log(f"preprocessing done ({time.perf_counter() - t0:.0f}s)")

    # f32 matmul precision for the pretrain stage only: on TPU the default
    # bf16 matmul precision STALLS the coupled InfoNCE task completely (chip:
    # val pinned at ln 64 for 15 epochs; the same pool data on CPU f32 reaches
    # val 0.08 by epoch 2 — the early similarity-matrix gradients round away
    # at bf16's 8-bit mantissa).  The supervised arms keep default precision.
    with jax.default_matmul_precision("float32"):
        enc_params, pt_info = pretrain_on_pool(args, work)
    result["pretrain"].update(pt_info)
    log(f"pool pretraining done ({pt_info['wall_s']}s; "
        f"val loss {pt_info['val_loss'][:2]}...{pt_info['val_loss'][-2:]})")

    dfs = (pipe._metadata("train"), pipe._metadata("val"), pipe._metadata("test"))

    # ---- full-data probe/finetune, both arms --------------------------------------
    result["full_data"] = {}
    for mode in ("linear_probe", "finetune"):
        for tag, enc in (("pretrained", enc_params), ("scratch", None)):
            t0 = time.perf_counter()
            m = full_data_arm(cfg, dfs, enc, mode, tag, pipe._next_key())
            m["wall_s"] = round(time.perf_counter() - t0, 1)
            result["full_data"][f"{mode}/{tag}"] = m
            log(f"full-data {mode}/{tag}: bal_acc={m['balanced_accuracy']:.2f} "
                f"({m['wall_s']}s)")

    # ---- few-shot grid, both arms -------------------------------------------------
    train_df, val_df, test_df = dfs
    raws = {}
    for tag, enc in (("pretrained", enc_params), ("scratch", None)):
        t0 = time.perf_counter()
        raw = run_parallel_fewshot(
            cfg, enc, train_df, test_df, val_df,
            experiment_name=tag, rng=jax.random.PRNGKey(args.seed + 100),
        )
        raw.to_csv(out / f"fewshot_{tag}_raw.csv", index=False)
        raws[tag] = raw
        log(f"few-shot grid [{tag}] done ({time.perf_counter() - t0:.0f}s)")

    evaluator = FewShotEvaluator(cfg)
    aggs = {tag: evaluator.aggregate_results(raw) for tag, raw in raws.items()}

    # per-cell pretrained-vs-scratch deltas (the claim under test)
    cells = []
    for (_, row) in aggs["pretrained"].iterrows():
        n, mode = row["n_samples"], row["mode"]
        srow = aggs["scratch"][
            (aggs["scratch"]["n_samples"] == n) & (aggs["scratch"]["mode"] == mode)
        ].iloc[0]
        cells.append({
            "n_samples": int(n), "mode": str(mode),
            "pretrained_mean": round(float(row["balanced_accuracy_mean"]), 2),
            "pretrained_std": round(float(row["balanced_accuracy_std"]), 2),
            "scratch_mean": round(float(srow["balanced_accuracy_mean"]), 2),
            "scratch_std": round(float(srow["balanced_accuracy_std"]), 2),
            "delta": round(
                float(row["balanced_accuracy_mean"] - srow["balanced_accuracy_mean"]), 2
            ),
        })
    result["few_shot_cells"] = cells
    deltas = [c["delta"] for c in cells]
    result["few_shot_mean_delta"] = round(float(np.mean(deltas)), 2)
    result["platform"] = jax.devices()[0].platform

    # ---- artifacts ----------------------------------------------------------------
    (out / "article_workflow.json").write_text(json.dumps(result, indent=1))
    lines = [
        "# Article workflow on the hard fixture (pretrain → probe → few-shot)",
        "",
        f"Fixture: {args.classes} classes, hard (overlapped), label_noise="
        f"{args.label_noise}; pretrain {result['pretrain']['loss']} "
        f"{args.pretrain_epochs} ep; budget {args.epochs} ep/cell, "
        f"{args.runs} runs.  Platform: {result['platform']}.",
        "",
        "## Full-data (balanced accuracy)",
        "",
        "| mode | pretrained | scratch | delta |",
        "|---|---|---|---|",
    ]
    for mode in ("linear_probe", "finetune"):
        p = result["full_data"][f"{mode}/pretrained"]["balanced_accuracy"]
        s = result["full_data"][f"{mode}/scratch"]["balanced_accuracy"]
        lines.append(f"| {mode} | {p:.2f} | {s:.2f} | {p - s:+.2f} |")
    lines += [
        "",
        "## Few-shot grid (balanced accuracy, mean ± std over runs)",
        "",
        "| n/class | mode | pretrained | scratch | delta |",
        "|---|---|---|---|---|",
    ]
    for c in cells:
        lines.append(
            f"| {c['n_samples']} | {c['mode']} | {c['pretrained_mean']:.2f} ± "
            f"{c['pretrained_std']:.2f} | {c['scratch_mean']:.2f} ± "
            f"{c['scratch_std']:.2f} | {c['delta']:+.2f} |"
        )
    lines.append("")
    lines.append(f"Mean few-shot delta: **{result['few_shot_mean_delta']:+.2f}** points.")
    (out / "summary.md").write_text("\n".join(lines))
    log(f"artifacts -> {out}/")
    print(json.dumps({
        "bench": "article_workflow_hard",
        "few_shot_mean_delta": result["few_shot_mean_delta"],
        "full_data": result["full_data"],
        "cells": cells,
    }))


if __name__ == "__main__":
    main()
