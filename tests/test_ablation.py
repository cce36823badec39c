"""rule_ablation / rule_overlap — filter-cascade audit operators.

Hand-computed truth table over a tiny frame:

  row | a     | b     | c
  1   | T     | F     | F      → fires a only        (unique a)
  2   | T     | T     | F      → fires a+b           (no uniques)
  3   | F     | F     | F      → kept
  4   | F     | NULL  | T      → fires c only        (unique c; null ≠ fire)
  5   | T     | T     | T      → fires all three
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fineweb_domain_analyzer_spark.operators.metrics import (
    rule_ablation,
    rule_overlap,
)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, True, False, False),
        (2, True, True, False),
        (3, False, False, False),
        (4, False, None, True),
        (5, True, True, True),
    ]
    return spark.createDataFrame(rows, "id int, a boolean, b boolean, c boolean")


RULES = lambda: {  # noqa: E731 — fresh Column objects per test
    "a": F.col("a"),
    "b": F.col("b"),
    "c": F.col("c"),
}


class TestRuleAblation:
    def test_counts(self, frame):
        got = {
            r["rule"]: r.asDict() for r in rule_ablation(frame, RULES()).collect()
        }
        assert set(got) == {"a", "b", "c"}
        assert got["a"]["fires"] == 3 and got["a"]["unique_drops"] == 1
        assert got["b"]["fires"] == 2 and got["b"]["unique_drops"] == 0
        assert got["c"]["fires"] == 2 and got["c"]["unique_drops"] == 1
        # denominators constant across rows
        for r in got.values():
            assert r["total_docs"] == 5
            assert r["total_dropped"] == 4

    def test_null_is_not_a_fire(self, frame):
        # row 4's b is NULL: with strict AND semantics it would poison
        # the unique count of c; permissive coalesce keeps c unique=1
        got = {
            r["rule"]: r for r in rule_ablation(frame, RULES()).collect()
        }
        assert got["c"]["unique_drops"] == 1

    def test_empty_frame(self, frame):
        empty = frame.filter(F.lit(False))
        got = {r["rule"]: r for r in rule_ablation(empty, RULES()).collect()}
        assert all(
            r["fires"] == 0 and r["unique_drops"] == 0 and r["total_docs"] == 0
            for r in got.values()
        )

    def test_empty_rules_raises(self, frame):
        with pytest.raises(ValueError):
            rule_ablation(frame, {})


class TestRuleOverlap:
    def test_pairs(self, frame):
        got = {
            (r["rule_a"], r["rule_b"]): r["both_fire"]
            for r in rule_overlap(frame, RULES()).collect()
        }
        assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}

    def test_single_rule_raises(self, frame):
        with pytest.raises(ValueError):
            rule_overlap(frame, {"a": F.col("a")})


class TestFlagshipParity:
    def test_unique_drops_bounded_by_histogram(self, spark):
        """Cross-check against the precedence histogram on the sf0.001
        corpus: each rule's independent fires must be >= the number of
        docs its stage won by precedence, and total_dropped must equal
        the histogram's non-kept total (the cascade keep decision is
        'no rule fires')."""
        from fineweb_domain_analyzer_spark.queries import (
            _pipeline_fire_rules,
            q101_rule_ablation,
        )

        sf_dir = "/root/testdata/sf0.001"
        df, _ = _pipeline_fire_rules(spark, sf_dir)
        hist = {
            r["drop_reason"]: r["cnt"]
            for r in df.groupBy("drop_reason")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        abl = {
            r["rule"]: r for r in q101_rule_ablation(spark, sf_dir).collect()
        }
        dropped = sum(v for k, v in hist.items() if k != "kept")
        assert abl["robots"]["total_dropped"] == dropped
        assert abl["robots"]["fires"] == hist.get("robots_disallowed", 0)
        assert abl["language"]["fires"] >= hist.get("language_filtered", 0)
        quality_rules = (
            "word_count",
            "mean_word_len",
            "symbol_ratio",
            "stopword_density",
            "repeat_ratio",
        )
        assert sum(abl[r]["fires"] for r in quality_rules) >= hist.get(
            "quality_filtered", 0
        )


class TestRuleNameValidation:
    def test_non_identifier_rule_name_rejected(self, frame):
        with pytest.raises(ValueError, match="identifiers"):
            rule_ablation(frame, {"word count": F.col("a")})
        with pytest.raises(ValueError, match="identifiers"):
            rule_overlap(frame, {"a'b": F.col("a"), "ok": F.col("b")})
