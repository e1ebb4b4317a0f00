"""Report tables and OOD scoring units."""
import json

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from tpuhar.ood import (
    MahalanobisScorer,
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


def test_compute_ood_scores_keys(rng):
    logits = rng.normal(size=(10, 4)).astype(np.float32)
    emb = rng.normal(size=(10, 8)).astype(np.float32)
    scorer = MahalanobisScorer.fit(emb, rng.integers(0, 4, 10), 4)
    out = compute_ood_scores(logits, emb, mahalanobis=scorer)
    assert set(out) == {"msp", "energy", "mahalanobis"}
    for v in out.values():
        assert v.shape == (10,)


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
