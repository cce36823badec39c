"""Page-type heuristics (operators/pagetype.py): soft-404 / login-wall
/ parked-domain / cookie-wall / placeholder detection with the REAL
phrase rules — the synthetic-vocab q103 rule set is oracle-checked by
the driver; these tests pin the production defaults on realistic page
bodies."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fineweb_domain_analyzer_spark.operators.pagetype import (
    DEFAULT_PAGE_TYPE_RULES,
    page_type_histogram,
    with_page_type,
)

PAGES = [
    # (id, text, expected_type, expected_idx)
    (1, "Oops! 404 Not Found. The page you requested could not be located.", "error_page", 0),
    (2, "Sorry, this page does not exist anymore.", "error_page", 0),
    (3, "Please log in to your account to read the full article.", "login_wall", 1),
    (4, "Sign in to continue reading premium content.", "login_wall", 1),
    (5, "This domain is for sale! Contact the registrar today.", "parked_domain", 2),
    (6, "example.org — domain parking by Registrar Inc.", "parked_domain", 2),
    (7, "We use cookies to improve your experience. Accept all cookies?", "cookie_wall", 3),
    (8, "Lorem ipsum dolor sit amet, consectetur adipiscing elit.", "placeholder", 4),
    (9, "Welcome to nginx! Further configuration is required.", "placeholder", 4),
    (10, "A thorough tutorial on distributed joins in Spark.", "content", -1),
    (11, None, "content", -1),
    (12, "", "content", -1),
]


@pytest.fixture(scope="module")
def classified(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, _e, _x in PAGES], "id int, text string"
    )
    return {
        r["id"]: (r["page_type"], r["rule_idx"])
        for r in with_page_type(df, idx_col="rule_idx").collect()
    }


class TestDefaults:
    @pytest.mark.parametrize("pid,text,expected,idx", PAGES)
    def test_classification(self, classified, pid, text, expected, idx):
        assert classified[pid] == (expected, idx)

    def test_case_insensitive(self, spark):
        df = spark.createDataFrame(
            [(1, "PAGE NOT FOUND — ERROR 404")], "id int, text string"
        )
        assert (
            with_page_type(df).collect()[0]["page_type"] == "error_page"
        )

    def test_precedence_first_match_wins(self, spark):
        # error phrase + cookie phrase: error_page is listed first
        df = spark.createDataFrame(
            [(1, "404 not found. we use cookies on this site.")],
            "id int, text string",
        )
        assert with_page_type(df).collect()[0]["page_type"] == "error_page"

    def test_empty_rules_raises(self, spark):
        df = spark.createDataFrame([(1, "x")], "id int, text string")
        with pytest.raises(ValueError):
            with_page_type(df, rules=[])


class TestHistogram:
    def test_counts(self, spark):
        df = spark.createDataFrame(
            [(i, t) for i, t, _e, _x in PAGES], "id int, text string"
        )
        got = {
            r["page_type"]: r["cnt"]
            for r in page_type_histogram(df).collect()
        }
        assert got == {
            "error_page": 2,
            "login_wall": 2,
            "parked_domain": 2,
            "cookie_wall": 1,
            "placeholder": 2,
            "content": 3,
        }


class TestCorpusRules:
    def test_q103_fires_discriminate(self, spark):
        """The synthetic-vocab rule set must actually split the corpus
        (a constant-output classifier would be a vacuous oracle)."""
        from fineweb_domain_analyzer_spark.queries import q103_page_type

        counts = {
            r["page_type"]: r["cnt"]
            for r in q103_page_type(spark, "/root/testdata/sf0.001")
            .groupBy("page_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        assert counts.get("content", 0) > 0
        assert sum(v for k, v in counts.items() if k != "content") > 0
        assert len(counts) >= 3

    def test_zero_exchanges(self, spark):
        """Classification is a pure map stage: no Exchange in the plan."""
        from fineweb_domain_analyzer_spark.queries import q103_page_type

        plan = (
            q103_page_type(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
