"""Dump-drift operator tests: hand-computed JS terms and scalar,
zero-count / null-category / identical-mix edges, determinism of the
md5 dump split, and the one-shuffle plan contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fineweb_domain_analyzer_spark.operators.drift import (
    distribution_drift,
    js_divergence,
    with_dump,
)


def test_drift_hand_computed(spark):
    """dump0 = {a: 2, b: 2}, dump1 = {a: 3, b: 1}:
    p0 = (0.5, 0.5), p1 = (0.75, 0.25), m = (0.625, 0.375)
    term_a = 0.5·0.5·ln(0.8) + 0.5·0.75·ln(1.2)
    term_b = 0.5·0.5·ln(4/3) + 0.5·0.25·ln(2/3)
    js = term_a + term_b
    """
    rows = [(0, "a")] * 2 + [(0, "b")] * 2 + [(1, "a")] * 3 + [(1, "b")]
    df = spark.createDataFrame(rows, "dump int, cat string")
    d = {r["category"]: r for r in distribution_drift(df, "cat").collect()}
    assert set(d) == {"a", "b"}
    assert (d["a"]["n0"], d["a"]["n1"]) == (2, 3)
    assert d["a"]["p0"] == 0.5 and d["a"]["p1"] == 0.75
    term_a = 0.5 * 0.5 * math.log(0.5 / 0.625) + 0.5 * 0.75 * math.log(
        0.75 / 0.625
    )
    term_b = 0.5 * 0.5 * math.log(0.5 / 0.375) + 0.5 * 0.25 * math.log(
        0.25 / 0.375
    )
    assert d["a"]["js_term"] == pytest.approx(term_a)
    assert d["b"]["js_term"] == pytest.approx(term_b)

    js = js_divergence(df, "cat").collect()[0]
    assert (js["n0"], js["n1"]) == (4, 4)
    assert js["js"] == pytest.approx(term_a + term_b, abs=2e-9)
    # JS is non-negative and bounded by ln 2
    assert 0 <= js["js"] <= math.log(2)


def test_drift_edges(spark):
    """A category absent from one dump contributes its one-sided term
    (0·ln0 = 0 for the missing side); null categories fold into '∅';
    identical mixes give js = 0 exactly."""
    df = spark.createDataFrame(
        [(0, "only0"), (0, "both"), (1, "both"), (1, None)],
        "dump int, cat string",
    )
    d = {r["category"]: r for r in distribution_drift(df, "cat").collect()}
    assert set(d) == {"only0", "both", "∅"}
    assert (d["only0"]["n0"], d["only0"]["n1"]) == (1, 0)
    assert d["only0"]["p1"] == 0.0
    # one-sided term: 0.5·p0·ln(p0/(p0/2)) = 0.5·p0·ln 2
    assert d["only0"]["js_term"] == pytest.approx(0.5 * 0.5 * math.log(2))
    assert (d["∅"]["n0"], d["∅"]["n1"]) == (0, 1)

    same = spark.createDataFrame(
        [(0, "a"), (0, "b"), (1, "a"), (1, "b")], "dump int, cat string"
    )
    assert js_divergence(same, "cat").collect()[0]["js"] == 0.0


def test_with_dump_deterministic_split(spark):
    """The md5 split is a pure function of the id (stable across runs
    and partitionings) and lands both halves for a non-trivial input."""
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id bigint")
    a = {r["doc_id"]: r["dump"] for r in with_dump(df).collect()}
    b = {
        r["doc_id"]: r["dump"]
        for r in with_dump(df.repartition(7)).collect()
    }
    assert a == b
    assert set(a.values()) == {0, 1}


def test_drift_plan_one_shuffle(spark):
    """distribution_drift's plan: the corpus is scanned ONCE and
    shuffled ONCE (the category-keyed exchange); the totals come from
    the aggregated category rows, not a second corpus pass."""
    df = spark.createDataFrame(
        [(i % 2, f"c{i % 3}") for i in range(100)], "dump int, cat string"
    )
    plan = (
        distribution_drift(df, "cat")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Scan ExistingRDD") == 1
