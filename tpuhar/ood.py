"""Out-of-distribution scoring: MSP, energy, Mahalanobis — plus leave-one-activity-out
evaluation harness.

This is north-star capability (BASELINE.json: "OOD eval: MSP/energy/Mahalanobis scores,
leave-one-activity-out splits"); the reference repo's name promises OOD but contains no
OOD code anywhere (SURVEY.md §7 scope note).

Conventions:
- Every scorer returns an **OOD score**: higher = more likely out-of-distribution.
- AUROC treats OOD as the positive class.
- Scores are computed on-device from the jitted predict step's ``logits`` and
  ``embeddings`` outputs, so serving-time OOD adds one tiny fused op to the program.
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from .eval.metrics import auroc


# ---------------------------------------------------------------------------------
# Scores
# ---------------------------------------------------------------------------------
def msp_score(logits: jax.Array) -> jax.Array:
    """Maximum-softmax-probability OOD score: ``1 - max_c p(c|x)``."""
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return 1.0 - jnp.max(p, axis=-1)


def energy_score(logits: jax.Array, temperature: float = 1.0) -> jax.Array:
    """Energy OOD score: ``-T · logsumexp(logits/T)`` (higher energy = more OOD)."""
    t = float(temperature)
    return -t * jax.nn.logsumexp(logits.astype(jnp.float32) / t, axis=-1)


@dataclass
class MahalanobisScorer:
    """Class-conditional Gaussian with shared covariance over ID embeddings.

    ``fit`` estimates per-class means and a tied covariance (+ eps·I for conditioning);
    ``score`` returns the minimum squared Mahalanobis distance to any class mean.
    """

    means: jax.Array  # (C, D)
    precision: jax.Array  # (D, D)

    @classmethod
    def fit(
        cls, embeddings, labels, num_classes: int, eps: float = 1e-3
    ) -> "MahalanobisScorer":
        # Fit on HOST in float64.  The tied covariance of a D-dim embedding
        # estimated from a few hundred windows is near-singular (kappa up to
        # ~1e3*D even after the eps*trace/D regularizer), and on TPU the default
        # matmul precision computes X^T X through bf16 passes — ~1e-3 relative
        # error that the inverse amplifies into garbage.  Observed live: the SAME
        # class-0 checkpoint scored Mahalanobis AUROC 0.98 / 0.56 / 0.90 in three
        # processes whose logit-space scores matched to 4 decimals.  The fit is
        # O(N*D^2) on tiny N, so numpy float64 costs nothing and makes the scorer
        # deterministic across platforms; only score() stays on-device.
        x = np.asarray(jax.device_get(embeddings), np.float64)
        y = np.asarray(jax.device_get(labels)).astype(np.int64)
        D = x.shape[-1]
        one_hot = np.eye(num_classes, dtype=np.float64)[y]  # (N, C)
        counts = np.maximum(one_hot.sum(0), 1.0)  # (C,)
        means = (one_hot.T @ x) / counts[:, None]  # (C, D)
        centered = x - means[y]  # (N, D)
        cov = (centered.T @ centered) / max(x.shape[0], 1)
        cov = cov + eps * np.trace(cov) / D * np.eye(D) + 1e-6 * np.eye(D)
        precision = np.linalg.inv(cov)
        return cls(
            means=jnp.asarray(means, jnp.float32),
            precision=jnp.asarray(precision, jnp.float32),
        )

    def score(self, embeddings) -> jax.Array:
        x = jnp.asarray(embeddings, jnp.float32)
        diff = x[:, None, :] - self.means[None, :, :]  # (N, C, D)
        # HIGHEST precision: default TPU einsum runs bf16 passes, and the
        # quadratic form inherits the covariance's ill-conditioning.
        md = jnp.einsum(
            "ncd,de,nce->nc", diff, self.precision, diff,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.min(md, axis=-1)


@dataclass
class RelativeMahalanobisScorer:
    """Relative Mahalanobis distance (Ren et al. 2021): class-conditional distance
    minus the distance under a single class-agnostic background Gaussian.

    Subtracting the background term cancels directions that are merely high-variance
    across ALL of the ID data (where raw Mahalanobis mistakes "unusual but
    in-manifold" for OOD), keeping only class-discriminative deviation.  Higher =
    more OOD.  Pure einsum/matmul — jittable, MXU-friendly.
    """

    means: jax.Array  # (C, D)
    precision: jax.Array  # (D, D)
    mean0: jax.Array  # (D,)
    precision0: jax.Array  # (D, D)

    @classmethod
    def fit(
        cls, embeddings, labels, num_classes: int, eps: float = 1e-3
    ) -> "RelativeMahalanobisScorer":
        # Host float64 fit for the same conditioning/precision reasons as
        # MahalanobisScorer.fit (the background covariance is just as singular).
        base = MahalanobisScorer.fit(embeddings, labels, num_classes, eps=eps)
        x = np.asarray(jax.device_get(embeddings), np.float64)
        D = x.shape[-1]
        mean0 = x.mean(0)
        c0 = x - mean0
        cov0 = (c0.T @ c0) / max(x.shape[0], 1)
        cov0 = cov0 + eps * np.trace(cov0) / D * np.eye(D) + 1e-6 * np.eye(D)
        return cls(
            means=base.means,
            precision=base.precision,
            mean0=jnp.asarray(mean0, jnp.float32),
            precision0=jnp.asarray(np.linalg.inv(cov0), jnp.float32),
        )

    def score(self, embeddings) -> jax.Array:
        x = jnp.asarray(embeddings, jnp.float32)
        diff = x[:, None, :] - self.means[None, :, :]  # (N, C, D)
        md = jnp.einsum(
            "ncd,de,nce->nc", diff, self.precision, diff,
            precision=jax.lax.Precision.HIGHEST,
        )
        d0 = x - self.mean0[None, :]
        md0 = jnp.einsum(
            "nd,de,ne->n", d0, self.precision0, d0,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.min(md, axis=-1) - md0


@dataclass
class KNNScorer:
    """Deep nearest-neighbor OOD score (Sun et al., ICML 2022): distance from the
    L2-normalized test embedding to its k-th nearest neighbor in an L2-normalized
    bank of ID-train embeddings.  Non-parametric — no Gaussian assumption, which is
    exactly what fails for msp/energy on hard fixtures.

    TPU mapping: the (M, N) cosine-similarity matrix is ONE matmul on the MXU and
    ``lax.top_k`` runs on-device; for unit vectors ``d² = 2 − 2·sim`` so no explicit
    pairwise-difference tensor is ever materialized.
    """

    bank: jax.Array  # (N, D) L2-normalized ID-train embeddings
    k: int = 10

    @classmethod
    def fit(
        cls, embeddings, k: int = 10, max_bank: int = 20000, seed: int = 0
    ) -> "KNNScorer":
        x = np.asarray(embeddings, np.float32)
        if x.shape[0] > max_bank:  # bound the bank: one matmul row per test point
            idx = np.random.default_rng(seed).choice(
                x.shape[0], size=max_bank, replace=False
            )
            x = x[np.sort(idx)]
        xb = jnp.asarray(x)
        xb = xb / jnp.maximum(jnp.linalg.norm(xb, axis=-1, keepdims=True), 1e-12)
        return cls(bank=xb, k=min(int(k), x.shape[0]))

    def score(self, embeddings) -> jax.Array:
        z = jnp.asarray(embeddings, jnp.float32)
        z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
        # HIGHEST precision: bf16-pass similarity error (~4e-3) is the same order
        # as the margin between neighboring k-th distances on tight ID clusters.
        sims = jnp.matmul(
            z, self.bank.T, precision=jax.lax.Precision.HIGHEST
        )  # (M, N) — MXU
        kth = jax.lax.top_k(sims, self.k)[0][:, -1]
        return jnp.sqrt(jnp.maximum(2.0 - 2.0 * kth, 0.0))


def compute_ood_scores(
    logits,
    embeddings=None,
    *,
    mahalanobis: Optional[MahalanobisScorer] = None,
    knn: Optional[KNNScorer] = None,
    rmd: Optional[RelativeMahalanobisScorer] = None,
    energy_temperature: float = 1.0,
    scores: Optional[List[str]] = None,
) -> Dict[str, np.ndarray]:
    """All requested OOD scores for a batch of predictions.

    Supported names: ``msp``/``energy`` (logit-space), ``mahalanobis``/``rmd``/
    ``knn`` (embedding-space; require a fitted scorer + embeddings).
    """
    scores = scores or ["msp", "energy", "mahalanobis"]
    out: Dict[str, np.ndarray] = {}
    if "msp" in scores:
        out["msp"] = np.asarray(msp_score(jnp.asarray(logits)))
    if "energy" in scores:
        out["energy"] = np.asarray(
            energy_score(jnp.asarray(logits), energy_temperature)
        )
    if "mahalanobis" in scores and mahalanobis is not None and embeddings is not None:
        out["mahalanobis"] = np.asarray(mahalanobis.score(embeddings))
    if "knn" in scores and knn is not None and embeddings is not None:
        out["knn"] = np.asarray(knn.score(embeddings))
    if "rmd" in scores and rmd is not None and embeddings is not None:
        out["rmd"] = np.asarray(rmd.score(embeddings))
    return out


def fit_ood_thresholds(
    id_scores: Dict[str, np.ndarray], id_fpr: float = 0.05
) -> Dict[str, float]:
    """Per-score decision thresholds from ID-only calibration data.

    Deployments rarely have OOD samples to tune against; what they can control is
    the false-positive rate on in-distribution traffic.  For each score (higher =
    more OOD) the threshold is the ``1 - id_fpr`` quantile of the ID calibration
    scores, so flagging ``score >= threshold`` rejects ~``id_fpr`` of ID inputs and
    as much OOD as the score's separation allows (the standard ID-percentile refit;
    pairs with ``fpr_at_tpr`` which evaluates the opposite sweep).

    Returns ``{score_name: threshold}`` — feed to
    ``InferenceEngine.calibrate_ood_thresholds`` / compare manually.
    """
    if not 0.0 < id_fpr < 1.0:
        raise ValueError(f"id_fpr must be in (0, 1), got {id_fpr}")
    return {
        name: float(np.quantile(np.asarray(s, np.float64), 1.0 - id_fpr))
        for name, s in id_scores.items()
    }


def fpr_at_tpr(ood_scores, is_ood, tpr: float = 0.95) -> float:
    """False-positive rate at the threshold achieving ``tpr`` true-positive rate
    (OOD = positive).  Standard OOD benchmark companion to AUROC."""
    s = np.asarray(ood_scores, dtype=np.float64)
    pos = np.asarray(is_ood).astype(bool)
    if pos.sum() == 0 or (~pos).sum() == 0:
        return float("nan")
    thresh = np.quantile(s[pos], 1.0 - tpr)
    return float((s[~pos] >= thresh).mean())


# ---------------------------------------------------------------------------------
# Leave-one-activity-out harness
# ---------------------------------------------------------------------------------
def leave_one_out_split(df: pd.DataFrame, held_out_class: int, remap=None):
    """Partition a manifest into ID (label != c, labels remapped to 0..C-2) and OOD rows.

    Returns ``(id_df_with_remapped_labels, ood_df, remap_dict)``.

    ``remap`` shares one label mapping across splits: the LOO harness computes it from
    the *train* split and passes it into val/test, so a split that happens to be
    missing a class cannot shift every later label (which would silently corrupt
    id_accuracy, the Mahalanobis class means, and AUROC). ID rows whose label is
    absent from the shared mapping (a class never trained on) are dropped.
    """
    id_df = df[df["label"] != held_out_class].copy()
    ood_df = df[df["label"] == held_out_class].copy()
    if remap is None:
        kept = sorted(id_df["label"].unique())
        remap = {old: new for new, old in enumerate(kept)}
    else:
        dropped = int((~id_df["label"].isin(remap)).sum())
        if dropped:
            print(
                f"[OOD] dropping {dropped} ID rows with labels absent from the "
                f"train split's class set"
            )
            id_df = id_df[id_df["label"].isin(remap)]
    id_df["label"] = id_df["label"].map(remap)
    return id_df, ood_df, remap


class OODEvaluator:
    """Leave-one-activity-out OOD evaluation.

    For each held-out class: train an IMU classifier on the remaining classes, collect
    logits/embeddings on ID-test and OOD windows, fit Mahalanobis on ID-train
    embeddings, and report AUROC + FPR@95 for each score.
    """

    def __init__(self, config, rng=None):
        self.config = config
        self.rng = rng if rng is not None else jax.random.PRNGKey(config.training.seed)

    def run_loo_experiments(
        self,
        train_df: pd.DataFrame,
        val_df: pd.DataFrame,
        test_df: pd.DataFrame,
        classes: Optional[List[int]] = None,
        encoder_params=None,
        verbose: bool = True,
        model_kind: str = "imu",
        reuse_checkpoints: bool = False,
    ) -> pd.DataFrame:
        """``model_kind``: "imu" (reference behavior — IMU classifier per held-out
        class) or "fusion" (north-star FusionClassifier on IMU+video windows; OOD
        scores come from the fused embedding, so the video tower's representation
        quality shows up in AUROC).

        ``reuse_checkpoints``: resume an interrupted LOO sweep — a class whose
        ``ood_loo_{c}`` checkpoint dir contains ``training_history.json`` (written
        only when ``fit`` runs to completion) is scored from its saved weights
        instead of retrained; the ``last`` checkpoint is preferred so the scores
        match what an uninterrupted run would have produced from the final state."""
        from .data.loader import BatchLoader
        from .eval.evaluator import Evaluator
        from .train.factory import build_classification_task, build_fusion_task
        from .train.loop import ClassificationTrainer

        if model_kind not in ("imu", "fusion"):
            raise ValueError(f"Unknown model_kind: {model_kind}")
        loader_mode = "classification" if model_kind == "imu" else "fusion"

        cfg = self.config
        classes = classes or list(cfg.ood.leave_out_classes) or sorted(
            train_df["label"].unique()
        )
        score_names = list(cfg.ood.scores)
        known = {"msp", "energy", "mahalanobis", "knn", "rmd"}
        unknown = set(score_names) - known
        if unknown:  # fail loudly: a typo here would silently drop a score column
            raise ValueError(f"Unknown ood.scores {sorted(unknown)}; known: {sorted(known)}")
        rows = []

        for c in classes:
            id_train, _, remap = leave_one_out_split(train_df, c)
            id_val, _, _ = leave_one_out_split(val_df, c, remap=remap)
            id_test, ood_test, _ = leave_one_out_split(test_df, c, remap=remap)
            if len(ood_test) == 0 or len(id_train) == 0:
                continue

            # temporarily shrink the label space
            import copy

            loo_cfg = copy.deepcopy(cfg)
            loo_cfg.model.num_classes = len(remap)

            self.rng, init_rng, fit_rng = jax.random.split(self.rng, 3)
            bs = min(loo_cfg.training.train_batch_size, max(len(id_train), 1))
            spe = max(len(id_train) // bs, 1)
            if model_kind == "imu":
                task = build_classification_task(
                    loo_cfg, "finetune", spe, init_rng,
                    encoder_params=encoder_params, batch_size=bs,
                )
            else:
                task = build_fusion_task(
                    loo_cfg, spe, init_rng,
                    encoder_params=encoder_params, batch_size=bs,
                )
            from .train import checkpoint as _ckpt

            save_dir = Path(loo_cfg.paths.checkpoints_dir) / f"ood_loo_{c}"
            reusable = None
            if reuse_checkpoints and (save_dir / "training_history.json").exists():
                for name in ("last", "best_model"):
                    if _ckpt.checkpoint_exists(save_dir / name):
                        reusable = save_dir / name
                        break
            if reusable is not None:
                if verbose:
                    print(f"[OOD] class {c}: reusing completed checkpoint {reusable}")
                task.state, _ = _ckpt.restore_checkpoint(reusable, task.state)
            else:
                trainer = ClassificationTrainer(
                    loo_cfg, task.state, task.train_step, task.eval_step,
                    save_dir, fit_rng, "finetune",
                )
                trainer.verbose = False
                task.state = trainer.fit(
                    BatchLoader(
                        id_train, loo_cfg, mode=loader_mode, batch_size=bs,
                        shuffle=True, drop_last=True, seed=int(c), prefetch=0,
                    ),
                    BatchLoader(id_val, loo_cfg, mode=loader_mode, prefetch=0),
                )

            ev = Evaluator(task, loo_cfg)
            id_out = ev.evaluate(
                BatchLoader(id_test, loo_cfg, mode=loader_mode, prefetch=0)
            )
            ood_out = ev.evaluate(
                BatchLoader(ood_test, loo_cfg, mode=loader_mode, prefetch=0)
            )
            tr_out = ev.evaluate(
                BatchLoader(id_train, loo_cfg, mode=loader_mode, prefetch=0)
            )

            maha = knn = rmd = None
            if "mahalanobis" in score_names:
                maha = MahalanobisScorer.fit(
                    tr_out["embeddings"], tr_out["labels"], loo_cfg.model.num_classes
                )
            if "knn" in score_names:
                knn = KNNScorer.fit(tr_out["embeddings"], k=cfg.ood.knn_k)
            if "rmd" in score_names:
                rmd = RelativeMahalanobisScorer.fit(
                    tr_out["embeddings"], tr_out["labels"], loo_cfg.model.num_classes
                )
            id_scores = compute_ood_scores(
                id_out["logits"], id_out["embeddings"], mahalanobis=maha,
                knn=knn, rmd=rmd,
                energy_temperature=cfg.ood.energy_temperature, scores=score_names,
            )
            ood_scores = compute_ood_scores(
                ood_out["logits"], ood_out["embeddings"], mahalanobis=maha,
                knn=knn, rmd=rmd,
                energy_temperature=cfg.ood.energy_temperature, scores=score_names,
            )

            for name in id_scores:
                s = np.concatenate([id_scores[name], ood_scores[name]])
                is_ood = np.concatenate(
                    [np.zeros(len(id_scores[name])), np.ones(len(ood_scores[name]))]
                )
                rows.append(
                    {
                        "held_out_class": c,
                        "score": name,
                        "auroc": auroc(s, is_ood),
                        "fpr_at_95tpr": fpr_at_tpr(s, is_ood),
                        "id_accuracy": id_out["metrics"]["accuracy"],
                        "n_id": int(len(id_scores[name])),
                        "n_ood": int(len(ood_scores[name])),
                    }
                )
            if verbose:
                got = {r["score"]: round(r["auroc"], 3) for r in rows[-len(id_scores):]}
                print(f"[OOD] held-out class {c}: AUROC {got}", flush=True)

        return pd.DataFrame(rows)

    @staticmethod
    def aggregate(results_df: pd.DataFrame) -> pd.DataFrame:
        """Mean AUROC/FPR per score across held-out classes."""
        return (
            results_df.groupby("score")[["auroc", "fpr_at_95tpr", "id_accuracy"]]
            .agg(["mean", "std"])
        )
