"""Evaluation: batched jitted inference, metric reports, few-shot harness,
scratch-vs-pretrained comparison.

Reference counterparts in ``src/eval/evaluator.py``:
- ``Evaluator`` (``:18-112``): batched predict collecting preds/labels/logits, ×100
  metrics, sklearn classification report, confusion-matrix PNG.
- ``FewShotEvaluator`` (``:115-263``): [10,20,50,100]×5-run×{probe,finetune} grid —
  40 trainings — seeds ``run+42`` (``:154``), hardcoded batch sizes 32/64
  (``:160-161``), mean±std aggregation (``:218-231``), article-style pivot table.
- ``compare_baseline_vs_pretrained`` (``:266-303``): half-implemented in the reference
  (broken imports, commented-out pretrained branch); implemented for real here.

Fidelity notes:
- quirk Q4: the reference fits few-shot runs with the *test* loader as validation
  (``:174``, ``:191``).  Default here uses a held-out val split;
  ``config.eval.replicate_test_as_val=True`` reproduces the leakage.
- quirk Q5: the reference passes one shared encoder module into all 40 runs, so
  finetune runs mutate later runs' init.  Functional params make every run start from
  the same pretrained tree here, which is the reproducible interpretation.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np
import pandas as pd

from ..data.loader import BatchLoader
from ..data.manifest import FewShotSampler
from ..train.factory import build_classification_task
from ..train.loop import ClassificationTrainer
from .metrics import confusion_update, init_confusion, metrics_from_confusion


class Evaluator:
    """Batched evaluation of a classification task (reference ``Evaluator``)."""

    def __init__(self, task, config):
        self.task = task
        self.config = config

    def predict(self, loader):
        """Returns ``(predictions, labels, logits, embeddings)`` as numpy arrays.

        Per-window logits are the fidelity surface named by BASELINE.json; embeddings
        feed Mahalanobis OOD scoring.
        """
        preds, labels, logits, embs = [], [], [], []
        for batch in loader:
            out = self.task.eval_step(self.task.state, batch)
            valid = np.asarray(out["valid"])
            preds.append(np.asarray(out["preds"])[valid])
            logits.append(np.asarray(out["logits"])[valid])
            embs.append(np.asarray(out["embeddings"])[valid])
            labels.append(np.asarray(batch["label"])[valid])
        return (
            np.concatenate(preds) if preds else np.zeros(0, np.int32),
            np.concatenate(labels) if labels else np.zeros(0, np.int32),
            np.vstack(logits) if logits else np.zeros((0, self.config.model.num_classes)),
            np.vstack(embs) if embs else np.zeros((0, 0)),
        )

    def compute_metrics(self, y_true, y_pred) -> Dict[str, float]:
        C = self.config.model.num_classes
        cm = init_confusion(C)
        cm = confusion_update(
            cm,
            jax.numpy.asarray(y_true),
            jax.numpy.asarray(y_pred),
            jax.numpy.ones(len(y_true), bool),
        )
        return metrics_from_confusion(cm)

    def evaluate(self, loader) -> Dict:
        preds, labels, logits, embs = self.predict(loader)
        from .calibration import expected_calibration_error

        return {
            "metrics": self.compute_metrics(labels, preds),
            "predictions": preds,
            "labels": labels,
            "logits": logits,
            "embeddings": embs,
            # beyond-reference: confidence calibration of the logits (msp/energy OOD
            # thresholds and abstention rules read softmax margins; see
            # eval/calibration.py for the temperature-scaling fix)
            "calibration": expected_calibration_error(logits, labels),
        }

    def generate_classification_report(self, y_true, y_pred, class_names=None):
        from sklearn.metrics import classification_report

        if class_names is None:
            class_names = [str(i) for i in range(self.config.model.num_classes)]
        labels = list(range(self.config.model.num_classes))
        report = classification_report(
            y_true, y_pred, labels=labels, target_names=class_names,
            output_dict=True, zero_division=0,
        )
        return pd.DataFrame(report).transpose()

    def plot_confusion_matrix(self, y_true, y_pred, class_names=None, save_path=None):
        from ..report.plots import plot_confusion_matrix

        plot_confusion_matrix(
            y_true, y_pred, self.config.model.num_classes,
            class_names=class_names, save_path=save_path,
        )


class FewShotEvaluator:
    """Few-shot grid harness (reference ``FewShotEvaluator``)."""

    def __init__(self, config, rng=None):
        self.config = config
        self.rng = rng if rng is not None else jax.random.PRNGKey(config.training.seed)

    def run_few_shot_experiments(
        self,
        pretrained_encoder_params,
        train_df: pd.DataFrame,
        test_df: pd.DataFrame,
        val_df: Optional[pd.DataFrame] = None,
        experiment_name: str = "default",
        verbose: bool = True,
    ) -> pd.DataFrame:
        """Run the sample-count × run × mode grid; returns the raw results DataFrame
        with the reference's row schema (``evaluator.py:197-211``)."""
        e = self.config.eval
        if e.replicate_test_as_val or val_df is None:
            fit_val_df = test_df  # quirk Q4 replication / no val available
        else:
            fit_val_df = val_df

        results = []
        for n_samples in e.few_shot_samples:
            for run in range(e.few_shot_runs):
                sampler = FewShotSampler(train_df, self.config)
                train_subset = sampler.sample_k_per_class(n_samples, seed=run + 42)
                for mode in e.eval_modes:
                    metrics = self._train_and_eval(
                        pretrained_encoder_params, train_subset, fit_val_df, test_df,
                        mode, run, verbose=verbose,
                    )
                    results.append(
                        {
                            "experiment": experiment_name,
                            "n_samples": n_samples,
                            "run": run,
                            "mode": mode,
                            **metrics,
                        }
                    )
                    if verbose:
                        print(
                            f"[FewShot] {experiment_name} n={n_samples} run={run} "
                            f"{mode}: bal_acc={metrics['balanced_accuracy']:.2f}",
                            flush=True,
                        )
        return pd.DataFrame(results)

    def _train_and_eval(
        self, encoder_params, train_subset, val_df, test_df, mode, run, verbose=False
    ) -> Dict[str, float]:
        cfg = self.config
        # Reference hardcodes train bs=32, eval bs=64 (evaluator.py:160-161).
        train_bs, eval_bs = 32, 64
        train_bs = min(train_bs, max(len(train_subset), 1))
        spe = max(len(train_subset) // train_bs, 1)
        self.rng, init_rng, fit_rng = jax.random.split(self.rng, 3)
        task = build_classification_task(
            cfg, mode, spe, init_rng,
            encoder_params=encoder_params, batch_size=train_bs,
        )
        trainer = ClassificationTrainer(
            cfg, task.state, task.train_step, task.eval_step,
            Path(cfg.paths.checkpoints_dir) / f"fewshot_{mode}_r{run}", fit_rng, mode,
        )
        trainer.verbose = False
        train_loader = BatchLoader(
            train_subset, cfg, mode="classification", batch_size=train_bs,
            shuffle=True, drop_last=True, seed=run + 42, prefetch=0,
        )
        val_loader = BatchLoader(
            val_df, cfg, mode="classification", batch_size=eval_bs, prefetch=0
        )
        task.state = trainer.fit(train_loader, val_loader)

        # Evaluate the best checkpoint on the test set.
        from ..train import checkpoint as ckpt

        best = trainer.save_dir / "best_model"
        if ckpt.checkpoint_exists(best):
            task.state, _ = ckpt.restore_checkpoint(best, task.state)
        test_loader = BatchLoader(
            test_df, cfg, mode="classification", batch_size=eval_bs, prefetch=0
        )
        return Evaluator(task, cfg).evaluate(test_loader)["metrics"]

    def aggregate_results(self, results_df: pd.DataFrame) -> pd.DataFrame:
        """mean±std grouped by (experiment, n_samples, mode) (``evaluator.py:218-231``)."""
        agg = (
            results_df.groupby(["experiment", "n_samples", "mode"])
            .agg(
                {
                    "balanced_accuracy": ["mean", "std"],
                    "f1_macro": ["mean", "std"],
                    "accuracy": ["mean", "std"],
                }
            )
            .reset_index()
        )
        agg.columns = ["_".join(col).strip("_") for col in agg.columns.values]
        return agg

    def create_comparison_table(self, results_dict: Dict[str, pd.DataFrame]) -> pd.DataFrame:
        """Article-style pivot (Table 3): rows (experiment, mode), cols n_samples."""
        all_results = []
        for exp_name, df in results_dict.items():
            agg = self.aggregate_results(df)
            agg["experiment"] = exp_name
            all_results.append(agg)
        comparison = pd.concat(all_results, ignore_index=True)
        comparison["balanced_accuracy_formatted"] = comparison.apply(
            lambda r: f"{r['balanced_accuracy_mean']:.2f} ± {r['balanced_accuracy_std']:.2f}",
            axis=1,
        )
        return comparison.pivot_table(
            index=["experiment", "mode"],
            columns="n_samples",
            values="balanced_accuracy_formatted",
            aggfunc="first",
        )


def compare_baseline_vs_pretrained(
    config,
    train_df: pd.DataFrame,
    val_df: pd.DataFrame,
    test_df: pd.DataFrame,
    pretrained_encoder_params=None,
    rng=None,
    verbose: bool = True,
) -> pd.DataFrame:
    """Scratch-vs-pretrained comparison — fully implemented (the reference declares this
    capability but ships it half-commented, ``evaluator.py:266-303``).

    Trains one finetune classifier from random init and, if ``pretrained_encoder_params``
    is given, one from the pretrained encoder; evaluates both on test.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(config.training.seed)
    rows = {}
    variants = {"baseline": None}
    if pretrained_encoder_params is not None:
        variants["pretrained"] = pretrained_encoder_params

    for name, enc in variants.items():
        rng, init_rng, fit_rng = jax.random.split(rng, 3)
        bs = config.training.train_batch_size
        spe = max(len(train_df) // bs, 1)
        task = build_classification_task(
            config, "finetune", spe, init_rng, encoder_params=enc
        )
        trainer = ClassificationTrainer(
            config, task.state, task.train_step, task.eval_step,
            Path(config.paths.checkpoints_dir) / f"compare_{name}", fit_rng, "finetune",
        )
        trainer.verbose = verbose
        train_loader = BatchLoader(
            train_df, config, mode="classification", shuffle=True, drop_last=True,
            seed=config.training.seed,
        )
        val_loader = BatchLoader(val_df, config, mode="classification")
        task.state = trainer.fit(train_loader, val_loader)
        test_loader = BatchLoader(test_df, config, mode="classification")
        rows[name] = Evaluator(task, config).evaluate(test_loader)["metrics"]

    return pd.DataFrame(rows).T


def save_results_table(df: pd.DataFrame, save_path, format: str = "csv") -> None:
    """CSV / LaTeX / Markdown export (reference ``evaluator.py:306-317``)."""
    save_path = Path(save_path)
    if format == "csv":
        df.to_csv(save_path)
    elif format == "latex":
        df.to_latex(save_path)
    elif format == "markdown":
        df.to_markdown(save_path)
    else:
        raise ValueError(f"Unknown format: {format}")
