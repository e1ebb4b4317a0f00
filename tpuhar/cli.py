"""Pipeline orchestrator + CLI: preprocess → pretrain → classify → evaluate (+ ood).

Mirrors the reference's ``main.py`` surface (``main.py:37-374``): a ``Pipeline`` class
with ``run_preprocessing / run_pretraining / run_classification / run_evaluation /
run_all / generate_final_report`` and an argparse CLI with ``--mode
{preprocess,pretrain,classify,evaluate,all}`` and ``--classify-mode
{linear_probe,finetune,both}``.  Additions beyond the reference: ``--mode ood``
(north-star leave-one-activity-out scoring), ``--mode report`` (tables only),
``--resume`` (the reference ships resume machinery nothing calls, SURVEY §5.4),
``--config`` (JSON load that actually works), ``--set section.key=value``
overrides, and ``--mode serve`` (raw-input stream serving through
``InferenceEngine.predict_stream`` — IMU-only by default, fusion/int8 via
``--serve-checkpoint``/``--serve-fusion``/``--serve-int8``).

Artifacts keep the reference's names/locations: ``results/pretraining_curves.png``
(``main.py:103-106``), ``classification_comparison.csv`` (``:199-206``),
``fewshot_results_{raw,agg}.csv`` (``:269-270``), ``final_report.json`` (``:335-339``).
Stage-skip logic in ``run_all`` matches ``main.py:280-288``.
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np
import pandas as pd

from .config import CONFIG, Config
from .data.loader import create_dataloaders
from .data.preprocess import Preprocessor
from .eval.evaluator import Evaluator, FewShotEvaluator, save_results_table
from .ood import OODEvaluator
from .report import plots
from .report.tables import create_article_tables_from_results
from .train import checkpoint as ckpt
from .train.factory import (
    build_classification_task,
    build_crossmodal_task,
)
from .train.loop import ClassificationTrainer, CrossModalTrainer
from .utils import check_dataset_paths, describe_devices, set_seed


class Pipeline:
    """Stage sequencing over the TPU-native stack (reference ``Pipeline``, ``main.py:37``)."""

    def __init__(self, config: Optional[Config] = None):
        self.config = config or CONFIG
        self.config.paths.ensure_dirs()
        self.root_key = set_seed(self.config.training.seed)
        print(f"[Pipeline] devices: {describe_devices()}")
        # Train over every visible device (reference: DataParallel when >1 GPU,
        # main.py:89-95). None on a single device — steps run un-sharded.
        from .parallel.mesh import maybe_mesh

        self.mesh = maybe_mesh(self.config)
        if self.mesh is not None:
            print(f"[Pipeline] training mesh: {dict(self.mesh.shape)}")
        status = check_dataset_paths(self.config)
        if not status["ok"]:
            print(f"[Pipeline] dataset path check: {status}")

    # -- helpers --------------------------------------------------------------------
    def _metadata(self, split: str) -> pd.DataFrame:
        path = Path(self.config.paths.preprocessed_dir) / f"{split}_metadata.csv"
        if not path.exists():
            raise FileNotFoundError(
                f"Missing {path}; run `--mode preprocess` first."
            )
        return pd.read_csv(path)

    def _next_key(self):
        self.root_key, sub = jax.random.split(self.root_key)
        return sub

    def _load_pretrained_encoder(self):
        """Load the best cross-modal checkpoint and extract the IMU-encoder subtree."""
        best = Path(self.config.paths.checkpoints_dir) / "cross_modal" / "best_model"
        if not ckpt.checkpoint_exists(best):
            return None, None
        task = build_crossmodal_task(self.config, 1, self._next_key())
        state, _ = ckpt.restore_checkpoint(best, task.state)
        enc_params = state.params["imu_encoder"]
        enc_bs = dict(state.batch_stats or {}).get("imu_encoder")
        return enc_params, enc_bs

    # -- stages ---------------------------------------------------------------------
    def run_preprocessing(self) -> Dict[str, pd.DataFrame]:
        print("\n=== Stage: preprocessing ===")
        return Preprocessor(self.config).run_full_preprocessing()

    def run_pretraining(self, resume: bool = False):
        print("\n=== Stage: cross-modal pretraining ===")
        cfg = self.config
        train_df, val_df, test_df = (
            self._metadata("train"), self._metadata("val"), self._metadata("test")
        )
        loaders = create_dataloaders(cfg, train_df, val_df, test_df, mode="cross_modal")
        spe = max(len(loaders["train"]), 1)
        # Precision knob for f32-operand pretraining (default: full-f32
        # matmuls).  NOTE the r4 hypothesis that bf16 matmul precision caused
        # the coupled-fixture InfoNCE stall was DISPROVED in r5: the stall
        # reproduces bit-identically under this f32 context and on CPU — it is
        # a property of InfoNCE at that configuration, not of the device
        # (scripts/debug_pretrain_parity.py, docs/BENCHMARKS.md "Article
        # workflow").  The knob stays for numerical-hygiene control only;
        # compute_dtype="bfloat16" models are untouched by it.
        prec = str(getattr(cfg.training, "pretrain_matmul_precision", "float32"))
        import contextlib

        prec_ctx = (
            contextlib.nullcontext() if prec in ("", "default")
            else jax.default_matmul_precision(prec)
        )
        with prec_ctx:
            task = build_crossmodal_task(cfg, spe, self._next_key(), mesh=self.mesh)

            trainer = CrossModalTrainer(
                cfg, task.state, task.train_step, task.eval_step,
                Path(cfg.paths.checkpoints_dir) / "cross_modal", self._next_key(),
                mesh=self.mesh,
            )
            task.state = trainer.fit(loaders["train"], loaders["val"], resume=resume)

        plots.plot_training_curves(
            trainer.history,
            Path(cfg.paths.results_dir) / "pretraining_curves.png",
            title="Cross-modal pretraining",
        )
        # Works, unlike the reference (quirk Q3: main.py:108 crashes on best_metric).
        print(f"[Pretrain] best val loss: {trainer.best_metric:.4f}")
        ckpt.save_params(
            Path(cfg.paths.checkpoints_dir) / "final_model_params.msgpack",
            task.state.params,
        )
        return trainer

    def run_classification(self, classify_mode: str = "both", resume: bool = False):
        print("\n=== Stage: IMU classification ===")
        cfg = self.config
        train_df, val_df, test_df = (
            self._metadata("train"), self._metadata("val"), self._metadata("test")
        )
        enc_params, enc_bs = self._load_pretrained_encoder()
        if enc_params is None:
            print("[Classify] no pretrained encoder found — training from scratch")

        modes = (
            ["linear_probe", "finetune"] if classify_mode == "both" else [classify_mode]
        )
        comparison = {}
        for mode in modes:
            print(f"\n--- {mode} ---")
            loaders = create_dataloaders(
                cfg, train_df, val_df, test_df, mode="classification"
            )
            spe = max(len(loaders["train"]), 1)
            task = build_classification_task(
                cfg, mode, spe, self._next_key(),
                encoder_params=enc_params, encoder_batch_stats=enc_bs,
                mesh=self.mesh,
            )
            trainer = ClassificationTrainer(
                cfg, task.state, task.train_step, task.eval_step,
                Path(cfg.paths.checkpoints_dir) / f"classifier_{mode}",
                self._next_key(), mode, mesh=self.mesh,
            )
            task.state = trainer.fit(loaders["train"], loaders["val"], resume=resume)

            best = trainer.save_dir / "best_model"
            if ckpt.checkpoint_exists(best):
                task.state, _ = ckpt.restore_checkpoint(best, task.state)
            evaluator = Evaluator(task, cfg)
            result = evaluator.evaluate(loaders["test"])
            # fit the calibration temperature on the HELD-OUT val split (never
            # test) and report test-set ECE after scaling alongside the raw ECE —
            # the fitted T is what deployments pass to InferenceEngine(temperature=)
            from .eval.calibration import (
                apply_temperature, expected_calibration_error, fit_temperature,
            )
            _, val_labels, val_logits, _ = evaluator.predict(loaders["val"])
            temp = fit_temperature(val_logits, val_labels)
            scaled = expected_calibration_error(
                np.asarray(apply_temperature(result["logits"], temp)),
                result["labels"],
            )
            comparison[mode] = {
                **result["metrics"],
                # confidence calibration (eval/calibration.py) — cal_ece/cal_mce/...
                **{f"cal_{k}": v for k, v in result["calibration"].items()},
                "cal_temperature": temp,
                "cal_ece_scaled": scaled["ece"],
            }
            print(
                f"[Classify:{mode}] test bal_acc="
                f"{result['metrics']['balanced_accuracy']:.2f}"
            )
            plots.plot_confusion_matrix(
                result["labels"], result["predictions"], cfg.model.num_classes,
                save_path=Path(cfg.paths.results_dir) / f"confusion_{mode}.png",
            )
            np.save(
                Path(cfg.paths.results_dir) / f"test_logits_{mode}.npy",
                result["logits"],
            )

        df = pd.DataFrame(comparison).T
        df.to_csv(Path(cfg.paths.results_dir) / "classification_comparison.csv")
        print(f"\n{df}")
        return df

    def run_evaluation(self) -> pd.DataFrame:
        print("\n=== Stage: few-shot evaluation ===")
        cfg = self.config
        train_df, test_df = self._metadata("train"), self._metadata("test")
        try:
            val_df = self._metadata("val")
        except FileNotFoundError:
            val_df = None
        enc_params, _ = self._load_pretrained_encoder()
        if enc_params is None:
            print("[FewShot] no pretrained encoder — using random init")

        evaluator = FewShotEvaluator(cfg, self._next_key())
        if cfg.eval.parallel_few_shot:
            from .eval.fewshot_parallel import run_parallel_fewshot

            raw = run_parallel_fewshot(
                cfg, enc_params, train_df, test_df, val_df,
                experiment_name="cross_modal", rng=self._next_key(),
            )
        else:
            raw = evaluator.run_few_shot_experiments(
                enc_params, train_df, test_df, val_df, experiment_name="cross_modal"
            )
        agg = evaluator.aggregate_results(raw)
        results_dir = Path(cfg.paths.results_dir)
        raw.to_csv(results_dir / "fewshot_results_raw.csv", index=False)
        agg.to_csv(results_dir / "fewshot_results_agg.csv", index=False)
        table = evaluator.create_comparison_table({"cross_modal": raw})
        save_results_table(table, results_dir / "fewshot_table3.csv")
        print(f"\n{table}")
        return raw

    def run_zeroshot(self) -> Dict:
        """Zero-shot IMU classification via video class prototypes (writes the
        ``zeroshot_results.json`` the reference's Table 4 machinery expects but
        nothing upstream ever produces)."""
        print("\n=== Stage: zero-shot evaluation ===")
        cfg = self.config
        from .eval.zeroshot import run_zero_shot

        train_df, test_df = self._metadata("train"), self._metadata("test")
        best = Path(cfg.paths.checkpoints_dir) / "cross_modal" / "best_model"
        if not ckpt.checkpoint_exists(best):
            raise FileNotFoundError("Zero-shot needs a pretrained cross-modal checkpoint")
        task = build_crossmodal_task(cfg, 1, self._next_key())
        task.state, _ = ckpt.restore_checkpoint(best, task.state)
        results = run_zero_shot(
            task, train_df, test_df, cfg,
            save_path=Path(cfg.paths.results_dir) / "zeroshot_results.json",
        )
        print(pd.DataFrame(results).T)
        return results

    def run_ablations(self) -> pd.DataFrame:
        """Encoder/featurizer ablation grid → ``ablation_results.csv`` (the artifact
        the reference's Table 5 machinery expects but never produces)."""
        print("\n=== Stage: ablations ===")
        cfg = self.config
        from .eval.ablation import run_ablations

        train_df, val_df, test_df = (
            self._metadata("train"), self._metadata("val"), self._metadata("test")
        )
        df = run_ablations(cfg, train_df, val_df, test_df, rng=self._next_key())
        df.to_csv(Path(cfg.paths.results_dir) / "ablation_results.csv", index=False)
        print(f"\n{df}")
        return df

    def run_ood(self, resume: bool = False) -> pd.DataFrame:
        """``resume=True`` (CLI ``--resume``) reuses completed ``ood_loo_{c}``
        checkpoints so an interrupted LOO sweep finishes only its missing classes."""
        print("\n=== Stage: OOD leave-one-activity-out ===")
        cfg = self.config
        train_df, val_df, test_df = (
            self._metadata("train"), self._metadata("val"), self._metadata("test")
        )
        enc_params, _ = self._load_pretrained_encoder()
        evaluator = OODEvaluator(cfg, self._next_key())
        results = evaluator.run_loo_experiments(
            train_df, val_df, test_df, encoder_params=enc_params,
            model_kind=str(getattr(cfg.ood, "model_kind", "imu")),
            reuse_checkpoints=resume,
        )
        results_dir = Path(cfg.paths.results_dir)
        results.to_csv(results_dir / "ood_results.csv", index=False)
        if len(results):
            agg = OODEvaluator.aggregate(results)
            agg.to_csv(results_dir / "ood_results_agg.csv")
            print(f"\n{agg}")
        return results

    def run_serving(
        self,
        split: str = "test",
        checkpoint: Optional[str] = None,
        imu_only: bool = True,
        int8: bool = False,
        batch_size: int = 64,
        ood_id_fpr: Optional[float] = None,
    ) -> pd.DataFrame:
        """Serve the RAW dataset split through ``InferenceEngine.predict_stream``.

        Reconstructs raw sensor windows (the engine featurizes on device — the
        train==serve closure) and, for fusion checkpoints, decodes clips through
        the production loader path; writes ``serving_predictions_{split}.csv``
        (logits argmax + msp/energy scores per window) into ``results_dir`` and
        prints sustained throughput.  Default serves the pipeline's own
        ``classifier_finetune`` IMU model; pass ``checkpoint=`` +
        ``imu_only=False`` for a fusion tower (e.g. one trained by
        ``scripts/bench_accuracy.py``), ``int8=True`` to serve it quantized.
        """
        print("\n=== Stage: serving ===")
        import time

        from .data.raw_stream import raw_serving_stream
        from .serving import InferenceEngine

        cfg = self.config
        df = self._metadata(split)
        if checkpoint is None:
            checkpoint = str(
                Path(cfg.paths.checkpoints_dir) / "classifier_finetune" / "best_model"
            )
            imu_only = True
        if not ckpt.checkpoint_exists(Path(checkpoint)):
            raise FileNotFoundError(
                f"No checkpoint at {checkpoint}; run `--mode classify` first or "
                "pass --serve-checkpoint"
            )
        kw = {}
        if int8:
            if imu_only:
                raise ValueError("--serve-int8 applies to fusion (video) serving")
            # calibration clips straight from the split's own loader path
            calib = next(
                raw_serving_stream(cfg, df, batch_size=8, with_video=True)
            )
            kw["quantize_calib_clips"] = calib[1]
            kw["quantize_calib_imu"] = calib[0]
        engine = InferenceEngine.from_checkpoint(
            cfg, checkpoint, imu_only=imu_only,
            batch_sizes=[batch_size], mesh=self.mesh, **kw,
        )
        if ood_id_fpr is not None:
            # Fit per-score OOD decision thresholds on ID traffic (the val split)
            # served through THIS engine's exact program — the thresholds then
            # survive quantization/temperature because they move with the served
            # score distribution (ood.fit_ood_thresholds).
            val_df = self._metadata("val").head(8 * batch_size)
            calib_imu, calib_video = [], []
            for batch in raw_serving_stream(
                cfg, val_df, batch_size=batch_size, with_video=not imu_only
            ):  # yields (imu,) or (imu, video) tuples
                calib_imu.append(batch[0])
                if not imu_only:
                    calib_video.append(batch[1])
            thresholds = engine.calibrate_ood_thresholds(
                np.concatenate(calib_imu),
                np.concatenate(calib_video) if calib_video else None,
                id_fpr=float(ood_id_fpr),
            )
            print(f"[Serve] OOD thresholds @ id_fpr={ood_id_fpr}: " + ", ".join(
                f"{k}={v:.4f}" for k, v in thresholds.items()))
        stream = raw_serving_stream(
            cfg, df, batch_size=batch_size, with_video=not imu_only
        )
        rows, served = [], 0
        t0 = time.perf_counter()
        for out in engine.predict_stream(stream):
            n = len(out["preds"])
            for j in range(n):
                row = {
                    "pred": int(out["preds"][j]),
                    "msp": float(out["msp"][j]),
                    "energy": float(out["energy"][j]),
                }
                for k in out:  # calibrated decision flags, when thresholds are set
                    if k.startswith("is_ood_"):
                        row[k] = bool(out[k][j])
                rows.append(row)
            served += n
        wall = time.perf_counter() - t0
        result = df.reset_index(drop=True).loc[: served - 1, ["label"]].copy()
        pred_df = pd.DataFrame(rows)
        result[pred_df.columns] = pred_df
        out_path = Path(cfg.paths.results_dir) / f"serving_predictions_{split}.csv"
        result.to_csv(out_path, index=False)
        acc = float((result["pred"] == result["label"]).mean()) * 100
        print(
            f"[Serve] {served} windows in {wall:.1f}s = {served / wall:.1f} inf/s "
            f"(accuracy {acc:.2f}%) -> {out_path}"
        )
        return result

    def run_all(self, classify_mode: str = "both", resume: bool = False):
        """Run every stage, skipping those whose artifacts exist (``main.py:280-288``)."""
        cfg = self.config
        t0 = time.time()
        if not (Path(cfg.paths.preprocessed_dir) / "train_metadata.csv").exists():
            self.run_preprocessing()
        else:
            print("[run_all] preprocessing artifacts found — skipping")
        if not ckpt.checkpoint_exists(
            Path(cfg.paths.checkpoints_dir) / "cross_modal" / "best_model"
        ):
            self.run_pretraining(resume=resume)
        else:
            print("[run_all] pretraining checkpoint found — skipping")
        try:
            self.run_zeroshot()
        except Exception as e:
            print(f"[run_all] zero-shot skipped: {e}")
        self.run_classification(classify_mode, resume=resume)
        self.run_evaluation()
        if cfg.ood.enabled:
            self.run_ood(resume=resume)
        self.generate_final_report()
        print(f"[run_all] total {time.time() - t0:.0f}s")

    def generate_final_report(self) -> Dict:
        """Assemble ``final_report.json`` from stage artifacts (``main.py:299-339``)."""
        cfg = self.config
        results_dir = Path(cfg.paths.results_dir)
        report: Dict = {
            "config": cfg.to_dict(),
            "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        }
        try:
            comp = results_dir / "classification_comparison.csv"
            if comp.exists():
                report["classification"] = (
                    pd.read_csv(comp, index_col=0).to_dict(orient="index")
                )
        except Exception as e:
            report["classification_error"] = str(e)
        try:
            agg = results_dir / "fewshot_results_agg.csv"
            if agg.exists():
                report["few_shot"] = pd.read_csv(agg).to_dict(orient="records")
        except Exception as e:
            report["few_shot_error"] = str(e)
        try:
            oodp = results_dir / "ood_results_agg.csv"
            if oodp.exists():
                report["ood"] = pd.read_csv(oodp).to_dict(orient="records")
        except Exception as e:
            report["ood_error"] = str(e)
        try:
            hist = (
                Path(cfg.paths.checkpoints_dir) / "cross_modal" / "training_history.json"
            )
            if hist.exists():
                report["pretraining_history"] = json.loads(hist.read_text())
        except Exception as e:
            report["pretraining_error"] = str(e)

        out = results_dir / "final_report.json"
        out.write_text(json.dumps(report, indent=2, default=str))
        print(f"[Report] {out}")
        create_article_tables_from_results(results_dir)
        return report


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="TPU-native cross-modal IMU-video HAR pipeline"
    )
    parser.add_argument(
        "--mode",
        choices=[
            "preprocess", "pretrain", "classify", "evaluate", "zeroshot", "ood",
            "ablate", "report", "serve", "all",
        ],
        default="all",
    )
    parser.add_argument("--serve-split", default="test")
    parser.add_argument(
        "--serve-checkpoint", default=None,
        help="checkpoint to serve (default: the pipeline's classifier_finetune, "
        "IMU-only); fusion checkpoints imply video decoding",
    )
    parser.add_argument(
        "--serve-fusion", action="store_true",
        help="the --serve-checkpoint is a FusionClassifier (IMU+video serving)",
    )
    parser.add_argument(
        "--serve-int8", action="store_true",
        help="serve the fusion tower through the int8 PTQ program",
    )
    parser.add_argument("--serve-batch", type=int, default=64)
    parser.add_argument(
        "--serve-ood-fpr", type=float, default=None,
        help="calibrate per-score OOD decision thresholds on the val split at this "
        "target ID false-positive rate (e.g. 0.05); adds is_ood_* columns to the "
        "serving CSV",
    )
    parser.add_argument(
        "--classify-mode",
        choices=["linear_probe", "finetune", "both"],
        default="both",
    )
    parser.add_argument("--config", type=str, default=None, help="JSON config to load")
    parser.add_argument(
        "--resume", action="store_true", help="resume interrupted training from last"
    )
    parser.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE",
        help="config override, e.g. --set training.pretrain_epochs=3",
    )
    args = parser.parse_args(argv)

    config = Config.load(args.config) if args.config else CONFIG
    for override in args.set:
        key, value = override.split("=", 1)
        config.override(key, value)

    pipeline = Pipeline(config)
    if args.mode == "preprocess":
        pipeline.run_preprocessing()
    elif args.mode == "pretrain":
        pipeline.run_pretraining(resume=args.resume)
    elif args.mode == "classify":
        pipeline.run_classification(args.classify_mode, resume=args.resume)
    elif args.mode == "evaluate":
        pipeline.run_evaluation()
    elif args.mode == "zeroshot":
        pipeline.run_zeroshot()
    elif args.mode == "ablate":
        pipeline.run_ablations()
    elif args.mode == "ood":
        pipeline.run_ood(resume=args.resume)
    elif args.mode == "report":
        pipeline.generate_final_report()
    elif args.mode == "serve":
        pipeline.run_serving(
            split=args.serve_split,
            checkpoint=args.serve_checkpoint,
            imu_only=not args.serve_fusion,
            int8=args.serve_int8,
            batch_size=args.serve_batch,
            ood_id_fpr=args.serve_ood_fpr,
        )
    else:
        pipeline.run_all(args.classify_mode, resume=args.resume)


if __name__ == "__main__":
    main()
