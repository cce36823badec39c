"""Mixture-planning tests: hand-computed rates/epochs, upsampling
materialization, determinism under repartitioning, missing-group and
explicit-recipe behavior, achieved-share summary."""

from __future__ import annotations

from pyspark.sql import functions as F

from fineweb_domain_analyzer_spark.operators.mixing import (
    assign_copies,
    materialize,
    mixture_plan,
    mixture_summary,
)


def _corpus(spark, n_a=80, n_b=20):
    rows = [(i, "a") for i in range(n_a)] + [
        (1000 + i, "b") for i in range(n_b)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, lang string")


def test_plan_hand_computed_balanced(spark):
    """80 'a' + 20 'b', balanced shares (5000 bp each), budget = 100:
    rate_a = 5000·100 div 80 = 6250  (0.625×: downsample)
    rate_b = 5000·100 div 20 = 25000 (2.5×: 2 epochs + 0.5 Bernoulli)
    """
    plan = {
        r["grp"]: r
        for r in mixture_plan(_corpus(spark), "lang").collect()
    }
    a, b = plan["a"], plan["b"]
    assert (a["n_available"], a["target_bp"], a["rate_e4"]) == (80, 5000, 6250)
    assert (a["epochs"], a["rem_e4"]) == (0, 6250)
    assert (b["n_available"], b["rate_e4"]) == (20, 25000)
    assert (b["epochs"], b["rem_e4"]) == (2, 5000)


def test_plan_explicit_recipe_and_budget(spark):
    """Explicit 9:1 recipe with budget 50: rate_a = 9000·50 div 80 =
    5625; rate_b = 1000·50 div 20 = 2500; a group absent from the
    recipe gets share 0 (rate 0)."""
    df = _corpus(spark).union(
        spark.createDataFrame([(2000, "c")], "doc_id bigint, lang string")
    )
    plan = {
        r["grp"]: r
        for r in mixture_plan(
            df, "lang", budget=50, target_shares_bp={"a": 9000, "b": 1000}
        ).collect()
    }
    assert plan["a"]["rate_e4"] == 5625
    assert plan["b"]["rate_e4"] == 2500
    assert plan["c"]["rate_e4"] == 0 and plan["c"]["epochs"] == 0


def test_assign_and_materialize(spark):
    """copies = epochs + hash-Bernoulli(rem): group b (2 epochs + 0.5)
    gives every b-doc ≥ 2 copies; materialize emits exactly sum(copies)
    rows with 1-based epoch tags; copies are stable under
    repartitioning."""
    docs = _corpus(spark)
    plan = mixture_plan(docs, "lang")
    with_c = assign_copies(docs, plan, "lang")
    rows = {r["doc_id"]: r["copies"] for r in with_c.collect()}
    b_copies = [rows[1000 + i] for i in range(20)]
    assert all(c in (2, 3) for c in b_copies)
    a_copies = [rows[i] for i in range(80)]
    assert all(c in (0, 1) for c in a_copies)

    rows2 = {
        r["doc_id"]: r["copies"]
        for r in assign_copies(docs.repartition(13), plan, "lang").collect()
    }
    assert rows == rows2

    mat = materialize(with_c)
    assert mat.count() == sum(rows.values())
    eps = mat.filter(F.col("doc_id") == 1000).select("epoch").collect()
    assert sorted(e["epoch"] for e in eps) == list(
        range(1, rows[1000] + 1)
    )


def test_mixture_summary_shares(spark):
    """achieved_bp is the exact integer share of the sampled corpus and
    sums to ~10000 (floor slack < n_groups)."""
    docs = _corpus(spark)
    plan = mixture_plan(docs, "lang")
    summ = {
        r["grp"]: r
        for r in mixture_summary(
            assign_copies(docs, plan, "lang"), "lang"
        ).collect()
    }
    total = sum(r["n_sampled"] for r in summ.values())
    for r in summ.values():
        assert r["achieved_bp"] == r["n_sampled"] * 10000 // total
    assert 10000 - len(summ) < sum(r["achieved_bp"] for r in summ.values()) <= 10000
    # balanced target: both groups within rounding of 50/50
    assert abs(summ["a"]["achieved_bp"] - 5000) < 1500
