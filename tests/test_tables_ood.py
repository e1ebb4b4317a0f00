"""Report tables and OOD scoring units."""
import json

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from tpuhar.ood import (
    KNNScorer,
    MahalanobisScorer,
    RelativeMahalanobisScorer,
    compute_ood_scores,
    energy_score,
    fpr_at_tpr,
    leave_one_out_split,
    msp_score,
)
from tpuhar.report.tables import (
    TableGenerator,
    create_article_tables_from_results,
    create_latex_paper_table,
    format_mean_std,
    format_results_for_readme,
    make_demo_results,
)


# ---------------------------------------------------------------------------------
# Tables
# ---------------------------------------------------------------------------------
def test_format_mean_std():
    assert format_mean_std(51.234, 1.567) == "51.23 ± 1.57"
    assert format_mean_std(51.234, float("nan")) == "51.23"


def test_table3_pipeline(tmp_path):
    df = make_demo_results()
    gen = TableGenerator(tmp_path)
    t3 = gen.generate_table3_style(df)
    assert t3.shape == (6, 4)  # 3 experiments × 2 modes, 4 sample counts
    assert "±" in t3.iloc[0, 0]
    written = gen.save_tables({"table3": t3})
    import os

    for p in written["table3"]:
        assert os.path.exists(p)


def test_comparison_table_delta():
    df = make_demo_results()
    gen = TableGenerator(".")
    comp = gen.create_comparison_table(df)
    assert "delta" in comp.columns
    assert (comp["delta"] > 0).all()  # demo data gives finetune a +5 bump


def test_article_tables_from_results(tmp_path):
    make_demo_results().to_csv(tmp_path / "fewshot_results_raw.csv", index=False)
    (tmp_path / "zeroshot_results.json").write_text(
        json.dumps({"ours": {"accuracy": 42.0, "f1": 39.0}})
    )
    pd.DataFrame({"config": ["a", "b"], "accuracy": [50.0, 55.0]}).to_csv(
        tmp_path / "ablation_results.csv", index=False
    )
    tables = create_article_tables_from_results(tmp_path)
    assert {"table3_fewshot", "table4_zeroshot", "table5_ablation"} <= set(tables)
    assert (tmp_path / "table4_zeroshot.tex").exists()
    md = format_results_for_readme(tables)
    assert "table3_fewshot" in md


def test_latex_paper_table():
    df = pd.DataFrame({"a": [1.0]}, index=["row"])
    tex = create_latex_paper_table(df, caption="My Caption")
    assert "\\begin{table}" in tex and "\\caption{My Caption}" in tex


# ---------------------------------------------------------------------------------
# OOD scores
# ---------------------------------------------------------------------------------
def test_msp_energy_directionality():
    confident = jnp.asarray([[10.0, -5.0, -5.0]])
    uncertain = jnp.asarray([[0.1, 0.0, -0.1]])
    assert float(msp_score(confident)[0]) < float(msp_score(uncertain)[0])
    assert float(energy_score(confident)[0]) < float(energy_score(uncertain)[0])


def test_energy_temperature():
    logits = jnp.asarray([[2.0, 1.0, 0.0]])
    e1 = float(energy_score(logits, 1.0)[0])
    e2 = float(energy_score(logits, 2.0)[0])
    assert e1 != e2


def test_mahalanobis_separates_clusters(rng):
    d, n = 8, 200
    id_emb = np.concatenate(
        [
            rng.normal(0, 1, size=(n, d)),
            rng.normal(5, 1, size=(n, d)),
        ]
    ).astype(np.float32)
    labels = np.concatenate([np.zeros(n, int), np.ones(n, int)])
    scorer = MahalanobisScorer.fit(id_emb, labels, 2)
    ood_emb = rng.normal(15, 1, size=(50, d)).astype(np.float32)
    id_scores = np.asarray(scorer.score(id_emb))
    ood_scores = np.asarray(scorer.score(ood_emb))
    assert np.median(ood_scores) > np.percentile(id_scores, 99)


def _f64_reference_fit(x, y, num_classes, eps=1e-3):
    """Independent float64 Mahalanobis fit (the numerically-true answer)."""
    x = np.asarray(x, np.float64)
    D = x.shape[-1]
    means = np.stack([x[y == c].mean(0) for c in range(num_classes)])
    centered = x - means[y]
    cov = centered.T @ centered / len(x)
    cov = cov + eps * np.trace(cov) / D * np.eye(D) + 1e-6 * np.eye(D)
    return means, np.linalg.inv(cov)


def test_mahalanobis_fit_float64_on_illconditioned(rng):
    """Regression for the live TPU bug where the same checkpoint scored
    Mahalanobis AUROC 0.98 / 0.56 / 0.90 in three processes: the fit ran
    ``X.T @ X`` + ``inv`` on-device where default matmul precision (bf16
    passes) + a near-singular covariance amplified rounding into AUROC-sized
    swings.  The fit must match an independent float64 reference on an
    ill-conditioned embedding set — a float32 fit fails this by orders of
    magnitude (kappa ~1e6 here)."""
    N, D, C = 160, 48, 4
    y = rng.integers(0, C, N)
    # eigenvalue spread 1e6 → covariance condition number ~1e6 before eps reg
    scales = np.logspace(0, -6, D)
    x = rng.normal(size=(N, D)) * scales + np.eye(C)[y] @ rng.normal(size=(C, D))
    scorer = MahalanobisScorer.fit(x, y, C)
    means_ref, prec_ref = _f64_reference_fit(x, y, C)
    np.testing.assert_allclose(np.asarray(scorer.means), means_ref, rtol=1e-5)
    # float32 storage of the f64-computed inverse: relative error ~1e-7·|prec|
    np.testing.assert_allclose(
        np.asarray(scorer.precision), prec_ref,
        rtol=1e-4, atol=1e-4 * np.abs(prec_ref).max(),
    )
    # determinism: two fits on identical inputs are bitwise identical
    scorer2 = MahalanobisScorer.fit(x, y, C)
    assert np.array_equal(np.asarray(scorer.precision), np.asarray(scorer2.precision))

    # the old jnp-float32 fit diverges on this conditioning — keeps the test honest
    x32 = np.asarray(x, np.float32)
    means32 = np.stack([x32[y == c].mean(0) for c in range(C)])
    cen32 = x32 - means32[y]
    cov32 = cen32.T @ cen32 / np.float32(N)
    cov32 = cov32 + np.float32(1e-3) * np.trace(cov32) / D * np.eye(D, dtype=np.float32)
    cov32 = cov32 + np.float32(1e-6) * np.eye(D, dtype=np.float32)
    prec32 = np.linalg.inv(cov32)
    rel32 = np.abs(prec32 - prec_ref).max() / np.abs(prec_ref).max()
    relnew = np.abs(np.asarray(scorer.precision) - prec_ref).max() / np.abs(prec_ref).max()
    assert rel32 > 10 * max(relnew, 1e-12)


def test_compute_ood_scores_keys(rng):
    logits = rng.normal(size=(10, 4)).astype(np.float32)
    emb = rng.normal(size=(10, 8)).astype(np.float32)
    scorer = MahalanobisScorer.fit(emb, rng.integers(0, 4, 10), 4)
    out = compute_ood_scores(logits, emb, mahalanobis=scorer)
    assert set(out) == {"msp", "energy", "mahalanobis"}
    for v in out.values():
        assert v.shape == (10,)


def test_knn_scorer_separates_clusters(rng):
    # kNN operates on L2-normalized features: ID classes must be directional
    # clusters (as trained penultimate embeddings are), not zero-mean blobs —
    # normalization erases any purely radial offset.
    d, n = 8, 300
    m1, m2, m_ood = np.zeros(d), np.zeros(d), np.zeros(d)
    m1[0], m2[1], m_ood[7] = 10.0, 10.0, 10.0
    id_emb = np.concatenate(
        [m1 + rng.normal(0, 0.5, size=(n // 2, d)),
         m2 + rng.normal(0, 0.5, size=(n // 2, d))]
    ).astype(np.float32)
    ood_emb = (m_ood + rng.normal(0, 0.5, size=(50, d))).astype(np.float32)
    scorer = KNNScorer.fit(id_emb, k=10)
    id_scores = np.asarray(scorer.score(id_emb))
    ood_scores = np.asarray(scorer.score(ood_emb))
    assert np.median(ood_scores) > np.percentile(id_scores, 99)
    # unit-sphere geometry: kth-NN distance on normalized vectors is in [0, 2]
    assert float(id_scores.min()) >= 0.0 and float(ood_scores.max()) <= 2.0


def test_knn_scorer_bank_subsample_and_k_clamp(rng):
    emb = rng.normal(size=(100, 4)).astype(np.float32)
    s = KNNScorer.fit(emb, k=10, max_bank=32, seed=7)
    assert s.bank.shape == (32, 4)
    # deterministic subsample
    s2 = KNNScorer.fit(emb, k=10, max_bank=32, seed=7)
    np.testing.assert_array_equal(np.asarray(s.bank), np.asarray(s2.bank))
    # k never exceeds the bank size
    tiny = KNNScorer.fit(emb[:3], k=10)
    assert tiny.k == 3
    assert np.asarray(tiny.score(emb[:5])).shape == (5,)


def test_knn_scorer_jittable(rng):
    import jax

    emb = rng.normal(size=(64, 8)).astype(np.float32)
    scorer = KNNScorer.fit(emb, k=5)
    q = rng.normal(size=(9, 8)).astype(np.float32)
    eager = np.asarray(scorer.score(q))
    jitted = np.asarray(jax.jit(scorer.score)(q))
    np.testing.assert_allclose(eager, jitted, atol=1e-6)


def test_rmd_scorer_separates_and_cancels_background(rng):
    d, n = 8, 400
    # two ID classes; a shared high-variance nuisance direction (dim 0)
    nuisance = rng.normal(0, 8, size=(2 * n, 1))
    base = np.concatenate(
        [rng.normal(0, 1, size=(n, d - 1)), rng.normal(5, 1, size=(n, d - 1))]
    )
    id_emb = np.concatenate([nuisance, base], axis=1).astype(np.float32)
    labels = np.concatenate([np.zeros(n, int), np.ones(n, int)])
    scorer = RelativeMahalanobisScorer.fit(id_emb, labels, 2)
    # true OOD: off-manifold in the class-discriminative dims
    ood = np.concatenate(
        [rng.normal(0, 8, size=(50, 1)), rng.normal(15, 1, size=(50, d - 1))], axis=1
    ).astype(np.float32)
    # ID points that are merely extreme along the nuisance dim
    id_extreme = id_emb[:50].copy()
    id_extreme[:, 0] = 30.0
    s_id = np.asarray(scorer.score(id_emb))
    s_ood = np.asarray(scorer.score(ood))
    s_ext = np.asarray(scorer.score(id_extreme))
    assert np.median(s_ood) > np.percentile(s_id, 99)
    # the background term keeps nuisance-extreme ID points below true OOD
    assert np.median(s_ext) < np.median(s_ood)


def test_compute_ood_scores_knn_rmd_keys(rng):
    logits = rng.normal(size=(10, 4)).astype(np.float32)
    emb = rng.normal(size=(40, 8)).astype(np.float32)
    labels = rng.integers(0, 4, 40)
    out = compute_ood_scores(
        logits,
        emb[:10],
        mahalanobis=MahalanobisScorer.fit(emb, labels, 4),
        knn=KNNScorer.fit(emb, k=3),
        rmd=RelativeMahalanobisScorer.fit(emb, labels, 4),
        scores=["msp", "energy", "mahalanobis", "knn", "rmd"],
    )
    assert set(out) == {"msp", "energy", "mahalanobis", "knn", "rmd"}
    for v in out.values():
        assert v.shape == (10,)


def test_unknown_score_name_raises():
    from tpuhar.config import Config
    from tpuhar.ood import OODEvaluator

    cfg = Config()
    cfg.ood.scores = ["msp", "mahalanobiss"]  # typo must fail loudly, not drop a column
    df = pd.DataFrame({"label": [0, 1]})
    with pytest.raises(ValueError, match="mahalanobiss"):
        OODEvaluator(cfg).run_loo_experiments(df, df, df, classes=[0])


def test_fpr_at_tpr():
    # perfectly separated → FPR 0
    scores = np.concatenate([np.zeros(100), np.ones(100)])
    is_ood = np.concatenate([np.zeros(100), np.ones(100)])
    assert fpr_at_tpr(scores, is_ood) == 0.0
    # identical distributions → FPR ~ 1 at 95% TPR
    assert fpr_at_tpr(np.ones(200), is_ood) == 1.0


def test_leave_one_out_split():
    df = pd.DataFrame({"label": [0, 1, 2, 2, 3], "x": range(5)})
    id_df, ood_df, remap = leave_one_out_split(df, 2)
    assert len(ood_df) == 2
    assert sorted(id_df["label"].unique()) == [0, 1, 2]  # remapped 0,1,3 → 0,1,2
    assert remap == {0: 0, 1: 1, 3: 2}


def test_leave_one_out_split_shared_remap():
    """val/test splits missing a class must reuse the train remap (ADVICE r1: an
    independent remap silently shifts every later label)."""
    import pandas as pd

    from tpuhar.ood import leave_one_out_split

    train = pd.DataFrame({"label": [0, 1, 2, 3, 4] * 2})
    test = pd.DataFrame({"label": [0, 3, 4, 2]})  # class 1 absent, 2 held out

    _, _, remap = leave_one_out_split(train, 2)
    assert remap == {0: 0, 1: 1, 3: 2, 4: 3}
    id_test, ood_test, _ = leave_one_out_split(test, 2, remap=remap)
    # 3 → 2 and 4 → 3 under the SHARED map (an independent remap over {0,3,4}
    # would have produced 3 → 1, 4 → 2)
    assert id_test["label"].tolist() == [0, 2, 3]
    assert len(ood_test) == 1


def test_leave_one_out_split_drops_unseen_class(capsys):
    import pandas as pd

    from tpuhar.ood import leave_one_out_split

    train = pd.DataFrame({"label": [0, 1, 2, 3]})
    test = pd.DataFrame({"label": [0, 1, 3, 9]})  # 9 never trained on
    _, _, remap = leave_one_out_split(train, 2)
    id_test, _, _ = leave_one_out_split(test, 2, remap=remap)
    assert 9 not in id_test["label"].tolist()
    assert not id_test["label"].isna().any()
    assert "dropping 1 ID rows" in capsys.readouterr().out
