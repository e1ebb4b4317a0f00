#!/usr/bin/env python
"""int8 OOD-AUROC parity: score trained LOO fusion checkpoints via f32 vs int8 towers.

The north star is throughput *at OOD-AUROC parity* (BASELINE.md).  The int8 PTQ
flagship measures 10,499 inf/s (docs/BENCHMARKS.md); its accuracy evidence so far is
drift bounds on random nets.  This script closes the loop on TRAINED models: for each
leave-one-activity-out checkpoint produced by ``scripts/bench_accuracy.py``
(``outputs/bench_accuracy/tpu_cnn/checkpoints/ood_loo_{c}``), it scores the id/ood
test windows through

  - the f32 path (``FusionClassifier.apply`` on normalized clips — the Evaluator's
    exact semantics), and
  - the int8 path (``quantize_tpucnn(input_fold=...)`` tower on raw uint8 frames +
    ``fuse_with_tokens`` — the quantized serving program's exact semantics),

fits Mahalanobis per path on that path's own id-train embeddings (the
deployment-consistent protocol), and reports AUROC/FPR95 side by side.

Runs fine on CPU (default when the TPU is busy): ~15-30 min/class.

Usage: python scripts/validate_int8_ood.py [--classes 0,2,4] [--tower tpu_cnn] [--tpu]
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
    p.add_argument("--classes", default="0,2,4")
    p.add_argument("--tower", default="tpu_cnn")
    p.add_argument("--root", default="outputs/bench_accuracy")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--tpu", action="store_true", help="run on the TPU (default CPU)")
    p.add_argument(
        "--no-resident", action="store_true",
        help="skip the int8-resident serving path (ops/quant "
        "quant_tpucnn_forward_resident; scored as int8res/int8resr by default)",
    )
    p.add_argument(
        "--checkpoint", default="",
        help="checkpoint name under ood_loo_{c}/ (default: 'last' then "
        "'best_model' — matching the state the head-to-head evaluator scored)",
    )
    p.add_argument("--out", default="outputs/bench_accuracy/int8_ood_parity.json")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import pandas as pd

    log(f"devices: {jax.devices()}")

    from tpuhar.data.loader import BatchLoader
    from tpuhar.data.synthetic import make_synthetic_config
    from tpuhar.models.crossmodal import FusionClassifier
    from tpuhar.ood import (
        MahalanobisScorer,
        compute_ood_scores,
        fpr_at_tpr,
        leave_one_out_split,
    )
    from tpuhar.eval.metrics import auroc
    from tpuhar.ops.quant import (
        quant_resnet18_forward_resident,
        quant_tpucnn_forward_resident,
    )
    from tpuhar.ops.video import IMAGENET_MEAN, IMAGENET_STD, normalize_clip
    from tpuhar.serving_quant import _QUANT_BACKBONES, _VIT_BACKBONES
    from tpuhar.train import checkpoint as ckpt
    from tpuhar.train.factory import build_fusion_task

    root = Path(args.root)
    # identical config construction to scripts/bench_accuracy.py
    cfg = make_synthetic_config(
        root / "fixture", root / args.tower,
        num_classes=6, video_backbone=args.tower,
        video_resize=(224, 224), train_epochs=4, train_batch_size=args.batch,
    )
    cfg.data.video_frames_per_window = 16
    cfg.data.featurize_backend = "host"
    cfg.paths.preprocessed_dir = root / "preprocessed"

    dfs = {
        split: pd.read_csv(root / "preprocessed" / f"{split}_metadata.csv")
        for split in ("train", "val", "test")
    }

    model = None
    results = []
    for c in [int(x) for x in args.classes.split(",")]:
        # score the SAME state the head-to-head evaluator scored: trainer.fit
        # returns the last-epoch state and OODEvaluator's reuse prefers "last";
        # loading best_model here silently compared a different model (caught
        # live: identical msp/energy AUROCs, Mahalanobis 0.98 vs 0.56 — the
        # embedding geometry keeps improving after val accuracy saturates)
        ckpt_dir = root / args.tower / "checkpoints" / f"ood_loo_{c}"
        names = (args.checkpoint,) if args.checkpoint else ("last", "best_model")
        ckpt_path = next(
            (
                ckpt_dir / n
                for n in names
                if (ckpt_dir / n).with_suffix(".msgpack").exists()
            ),
            None,
        )
        if ckpt_path is None:
            log(f"missing checkpoint under {ckpt_dir} — skipping class {c}")
            continue
        t0 = time.perf_counter()
        id_train, _, remap = leave_one_out_split(dfs["train"], c)
        id_test, ood_test, _ = leave_one_out_split(dfs["test"], c, remap=remap)

        import copy

        loo_cfg = copy.deepcopy(cfg)
        loo_cfg.model.num_classes = len(remap)
        model = FusionClassifier(loo_cfg)

        # restore the trained LOO checkpoint into a fresh state template
        with jax.default_device(jax.devices("cpu")[0]):
            task = build_fusion_task(
                loo_cfg, 1, jax.random.PRNGKey(0), batch_size=args.batch
            )
        state, _ = ckpt.restore_checkpoint(ckpt_path, task.state)
        log(f"[class {c}] scoring checkpoint {ckpt_path.name}")
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        # build the int8 tower from the SAME checkpoint (calibrate on id-train clips)
        venc = variables["params"]["video_encoder"]
        # ViT towers carry no video_encoder batch_stats — mirror serving_quant
        vstats = dict(variables.get("batch_stats") or {}).get("video_encoder", {})
        calib_loader = BatchLoader(
            id_train.head(args.batch), loo_cfg, mode="fusion",
            batch_size=min(8, args.batch), prefetch=0,
        )
        calib_u8 = next(iter(calib_loader))["video"]
        # backbone dispatch mirrors tpuhar/serving_quant.build_quantized_forward
        # (kept inline here because this script scores raw AND recalibrated
        # variants of several programs from one quant tree)
        backbone = loo_cfg.model.video_backbone
        calibrate, quantize, quant_forward = _QUANT_BACKBONES[backbone]
        is_vit = backbone in _VIT_BACKBONES
        input_fold = backbone.startswith("tpu_cnn") or is_vit
        bb = venc["vit"] if is_vit else venc["backbone"]
        bbs = {} if is_vit else vstats["backbone"]
        with jax.default_device(jax.devices("cpu")[0]):
            norm_clips = np.asarray(jax.jit(normalize_clip)(calib_u8))
            if is_vit:
                calib_in = norm_clips[: max(64 // norm_clips.shape[1], 2)]
            else:
                calib_in = norm_clips.reshape((-1,) + calib_u8.shape[2:4] + (3,))[:64]
            act_stats = calibrate(bb, bbs, calib_in)
            kw = {"input_fold": (IMAGENET_MEAN, IMAGENET_STD)} if input_fold else {}
            q = jax.device_get(quantize(bb, bbs, act_stats, **kw))
        proj = venc["projection"]

        @jax.jit
        def f32_path(imu, video_u8):
            return model.apply(
                variables, imu, normalize_clip(video_u8), train=False
            )

        def _int8_path(video_fwd):
            @jax.jit
            def path(imu, video_u8):
                B, T = video_u8.shape[0], video_u8.shape[1]
                if is_vit:
                    feats = video_fwd(q, video_u8)  # whole clip, raw u8 (fold)
                elif input_fold:
                    frames = video_u8.reshape((B * T,) + video_u8.shape[2:])
                    feats = video_fwd(q, frames).reshape(B, T, -1)
                else:
                    video = normalize_clip(video_u8)
                    frames = video.reshape((B * T,) + video.shape[2:])
                    feats = video_fwd(q, frames).reshape(B, T, -1)
                tokens = feats @ proj["kernel"] + proj["bias"]
                return model.apply(
                    variables, imu, tokens, train=False,
                    method=FusionClassifier.fuse_with_tokens,
                )
            return path

        int8_path = _int8_path(quant_forward)
        int8_resident_path = None
        if not is_vit:
            int8_resident_path = _int8_path(
                quant_resnet18_forward_resident
                if backbone == "resnet18"
                else quant_tpucnn_forward_resident
            )

        def score_split(df, fn):
            logits, embs = [], []
            loader = BatchLoader(
                df, loo_cfg, mode="fusion", batch_size=args.batch, prefetch=0
            )
            for b in loader:
                lg, em = fn(b["imu"], b["video"])
                n = int(b["n_valid"]) if "n_valid" in b else len(lg)
                logits.append(np.asarray(lg)[:n])
                embs.append(np.asarray(em)[:n])
            return np.concatenate(logits), np.concatenate(embs)

        row = {"held_out_class": c}
        split_scores = {}
        paths = [("f32", f32_path), ("int8", int8_path)]
        if not args.no_resident and int8_resident_path is not None:
            paths.append(("int8res", int8_resident_path))
        for name, fn in paths:
            tr_lg, tr_em = score_split(id_train, fn)
            id_lg, id_em = score_split(id_test, fn)
            ood_lg, ood_em = score_split(ood_test, fn)
            split_scores[name] = (tr_lg, tr_em, id_lg, id_em, ood_lg, ood_em)

        # int8r / int8resr = the shipped serving semantics (serving_quant
        # recalibration): affine logit map fitted on the calibration split
        # (id-train), applied to held-out logits; embeddings (→ Mahalanobis) are
        # untouched.
        from tpuhar.serving_quant import fit_logit_recalibration

        for name in [n for n, _ in paths if n != "f32"]:
            a, b = fit_logit_recalibration(
                split_scores["f32"][0], split_scores[name][0]
            )
            tr_lg, tr_em, id_lg, id_em, ood_lg, ood_em = split_scores[name]
            split_scores[f"{name}r"] = (
                a * tr_lg + b, tr_em, a * id_lg + b, id_em, a * ood_lg + b, ood_em,
            )

        path_scores = {}
        for name, (tr_lg, tr_em, id_lg, id_em, ood_lg, ood_em) in split_scores.items():
            # leave_one_out_split already remapped the label column
            tr_labels = np.asarray(id_train["label"], np.int32)
            maha = MahalanobisScorer.fit(tr_em, tr_labels, len(remap))
            tr_s = compute_ood_scores(
                tr_lg, tr_em, mahalanobis=maha,
                energy_temperature=cfg.ood.energy_temperature,
            )
            id_s = compute_ood_scores(
                id_lg, id_em, mahalanobis=maha,
                energy_temperature=cfg.ood.energy_temperature,
            )
            ood_s = compute_ood_scores(
                ood_lg, ood_em, mahalanobis=maha,
                energy_temperature=cfg.ood.energy_temperature,
            )
            path_scores[name] = (tr_s, id_s, ood_s)
            for s in id_s:
                joined = np.concatenate([id_s[s], ood_s[s]])
                is_ood = np.concatenate(
                    [np.zeros(len(id_s[s])), np.ones(len(ood_s[s]))]
                )
                row[f"{name}_auroc_{s}"] = round(float(auroc(joined, is_ood)), 4)
                row[f"{name}_fpr95_{s}"] = round(float(fpr_at_tpr(joined, is_ood)), 4)
            row[f"{name}_id_acc"] = round(
                float(
                    (np.argmax(id_lg, 1) == np.asarray(id_test["label"])).mean()
                    * 100
                ),
                2,
            )
        # Threshold transfer (the deployment question behind
        # InferenceEngine.calibrate_ood_thresholds): fit the 95% ID-quantile
        # decision threshold per score on the f32 path's calibration (id-train)
        # scores, then apply it to BOTH paths' held-out scores.  If the shipped
        # int8 recalibration works, f32-fitted thresholds keep their ID FPR and
        # OOD detection rate under int8r; the per-path refit row shows what a
        # deployment that recalibrates thresholds on the int8 program gets.
        from tpuhar.ood import fit_ood_thresholds

        thr = fit_ood_thresholds(path_scores["f32"][0], id_fpr=0.05)
        for s, t in thr.items():
            entry = {}
            for name in ("f32", "int8r"):
                _, id_s, ood_s = path_scores[name]
                entry[f"{name}_id_fpr"] = round(float((id_s[s] >= t).mean()), 4)
                entry[f"{name}_ood_tpr"] = round(float((ood_s[s] >= t).mean()), 4)
            t8 = fit_ood_thresholds(
                {s: path_scores["int8r"][0][s]}, id_fpr=0.05
            )[s]
            tr8, id8, ood8 = path_scores["int8r"]
            entry["int8r_refit_id_fpr"] = round(float((id8[s] >= t8).mean()), 4)
            entry["int8r_refit_ood_tpr"] = round(float((ood8[s] >= t8).mean()), 4)
            row[f"thrx_{s}"] = entry

        results.append(row)
        log(f"[class {c}] ({time.perf_counter() - t0:.0f}s) " + json.dumps(row))
        Path(args.out).write_text(json.dumps(results, indent=2))

    # summary deltas (int8 = raw quantized logits; int8r = shipped recalibrated path;
    # int8res/int8resr = the int8-resident rewrite, raw/recalibrated)
    names = ["int8", "int8r"]
    if results and "int8res_auroc_msp" in results[0]:
        names += ["int8res", "int8resr"]
    for name in names:
        for s in ("msp", "energy", "mahalanobis"):
            d = [r[f"{name}_auroc_{s}"] - r[f"f32_auroc_{s}"] for r in results]
            log(
                f"AUROC delta {name}-f32 [{s}]: mean {np.mean(d):+.4f} "
                f"max |{np.max(np.abs(d)):.4f}|"
            )


if __name__ == "__main__":
    main()
