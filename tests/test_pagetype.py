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


class TestPipelineGate:
    """PipelineConfig.drop_page_types: the opt-in page-type stage of the
    flagship cascade (off by default — reference parity is pinned by
    test_filter_golden.py)."""

    @pytest.fixture(scope="class")
    def frames(self, spark):
        pages = spark.createDataFrame(
            [
                (
                    "https://a.example.com/1",
                    "404 not found the quick brown fox jumps over the lazy dog again and again today",
                ),
                (
                    "https://a.example.com/2",
                    "an ordinary well formed document about the habits of foxes and dogs in the wild",
                ),
                (
                    "https://a.example.com/3",
                    "we use cookies the quick brown fox jumps over the lazy dog every single day",
                ),
                (
                    "https://a.example.com/4",
                    # langid 'en' (stopword hits) but symbol_ratio > 0.5
                    "the ######## the ######## the ######## the ######## the ########",
                ),
            ],
            "url string, text string",
        )
        policy = spark.createDataFrame(
            [("a.example.com", True)], "domain string, crawl_allowed boolean"
        )
        return pages, policy

    def test_gate_off_is_default(self, spark, frames):
        from fineweb_domain_analyzer_spark.plans.pipeline import (
            PipelineConfig,
            quality_filter_pipeline,
        )

        pages, policy = frames
        out = quality_filter_pipeline(pages, policy, PipelineConfig(scrub=False))
        assert "page_type" not in out.columns
        reasons = {r["url"]: r["drop_reason"] for r in out.collect()}
        assert reasons["https://a.example.com/1"] == "kept"  # soft-404 slips through

    def test_gate_drops_and_attributes(self, spark, frames):
        from fineweb_domain_analyzer_spark.plans.pipeline import (
            REASON_PAGE_TYPE,
            PipelineConfig,
            quality_filter_pipeline,
        )

        pages, policy = frames
        out = quality_filter_pipeline(
            pages,
            policy,
            PipelineConfig(
                scrub=False, drop_page_types=("error_page", "cookie_wall")
            ),
        )
        rows = {r["url"]: r for r in out.collect()}
        assert rows["https://a.example.com/1"]["drop_reason"] == REASON_PAGE_TYPE
        assert rows["https://a.example.com/1"]["page_type"] == "error_page"
        assert not rows["https://a.example.com/1"]["keep"]
        assert rows["https://a.example.com/3"]["drop_reason"] == REASON_PAGE_TYPE
        assert rows["https://a.example.com/2"]["drop_reason"] == "kept"
        # page-type outranks quality, but only for listed classes: the
        # symbol-soup page is still a quality drop
        assert rows["https://a.example.com/4"]["drop_reason"] == "quality_filtered"

    def test_gate_precedence_below_robots(self, spark, frames):
        from fineweb_domain_analyzer_spark.plans.pipeline import (
            PipelineConfig,
            quality_filter_pipeline,
        )

        pages, _ = frames
        deny = spark.createDataFrame(
            [("a.example.com", False)], "domain string, crawl_allowed boolean"
        )
        out = quality_filter_pipeline(
            pages, deny, PipelineConfig(scrub=False, drop_page_types=("error_page",))
        )
        assert {r["drop_reason"] for r in out.collect()} == {"robots_disallowed"}

    def test_gate_stays_one_map_stage(self, spark, frames):
        """Enabling the gate must not add a shuffle: the only Exchanges
        in the labeled plan are the tiny policy dimension's."""
        from fineweb_domain_analyzer_spark.plans.pipeline import (
            PipelineConfig,
            quality_filter_pipeline,
        )

        pages, policy = frames
        out = quality_filter_pipeline(
            pages, policy, PipelineConfig(scrub=False, drop_page_types=("error_page",))
        )
        base = quality_filter_pipeline(pages, policy, PipelineConfig(scrub=False))
        def n_exchanges(df):
            plan = df._jdf.queryExecution().executedPlan().toString()
            return plan.count("Exchange")
        assert n_exchanges(out) == n_exchanges(base)


class TestScanWindow:
    def test_scan_chars_bounds_the_window(self, spark):
        text = ("x " * 50) + "404 not found"
        df = spark.createDataFrame([(1, text)], "id int, text string")
        full = with_page_type(df).collect()[0]["page_type"]
        bounded = with_page_type(df, scan_chars=20).collect()[0]["page_type"]
        assert full == "error_page"
        assert bounded == "content"  # marker past the window

    def test_scan_chars_keeps_top_markers(self, spark):
        df = spark.createDataFrame(
            [(1, "404 not found " + "x " * 5000)], "id int, text string"
        )
        assert (
            with_page_type(df, scan_chars=64).collect()[0]["page_type"]
            == "error_page"
        )
