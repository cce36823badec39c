"""Opt-in robots path-rule enforcement (the reference's documented
doc/code discrepancy, closed behind a flag).

Reference behavior (fineweb_analyzer.py:436-459): disallowed_paths are
COLLECTED into the policy but NEVER enforced; label_pages' default
(enforce_paths=False) reproduces that exactly — test_filter_golden.py
pins it against the golden fixtures. enforce_paths=True is the
extension under test here: RFC 9309 prefix matching of the URL path
against the joined Disallow list.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from fineweb_domain_analyzer_spark.operators.filtering import (
    REASON_BAD_URL,
    REASON_KEPT,
    REASON_ROBOTS_DISALLOWED,
    REASON_ROBOTS_PATH_DISALLOWED,
    label_pages,
    path_disallowed,
    url_path,
)

POLICY_SCHEMA = StructType(
    [
        StructField("domain", StringType()),
        StructField("crawl_allowed", BooleanType()),
        StructField("disallowed_paths", ArrayType(StringType())),
    ]
)


@pytest.fixture(scope="module")
def policy(spark):
    return spark.createDataFrame(
        [
            ("allowed.com", True, ["/private", "/tmp/"]),
            ("blockall.com", True, ["/"]),
            ("denied.com", False, ["/private"]),
            ("clean.com", True, []),
            ("nullpaths.com", True, None),
        ],
        POLICY_SCHEMA,
    )


def _label(spark, policy, urls, **kw):
    pages = spark.createDataFrame([(u,) for u in urls], "url string")
    out = label_pages(pages, policy, exact_domain=False, enforce_paths=True, **kw)
    return {r["url"]: (r["keep"], r["drop_reason"]) for r in out.collect()}


def test_truth_table(spark, policy):
    got = _label(
        spark,
        policy,
        [
            "https://allowed.com/public/page",   # no rule matches
            "https://allowed.com/private",       # exact == prefix match
            "https://allowed.com/private/sub",   # prefix match
            "https://allowed.com/privateer",     # startswith('/private') — RFC 9309 prefix semantics
            "https://allowed.com/tmp",           # '/tmp' does NOT start with '/tmp/'
            "https://allowed.com/tmp/x",         # matches '/tmp/'
            "https://blockall.com/anything",     # Disallow: / blocks all
            "https://blockall.com",              # absent path normalizes to '/'
            "https://denied.com/public",         # domain-level deny wins (precedence)
            "https://clean.com/private",         # empty rule list blocks nothing
            "https://nullpaths.com/private",     # null rule list blocks nothing
            "https://unknown.com/private",       # not in policy → default-allow, null paths
            "https://allowed.com/private?x=1",   # query excluded from the path
        ],
    )
    assert got["https://allowed.com/public/page"] == (True, REASON_KEPT)
    assert got["https://allowed.com/private"] == (False, REASON_ROBOTS_PATH_DISALLOWED)
    assert got["https://allowed.com/private/sub"] == (
        False,
        REASON_ROBOTS_PATH_DISALLOWED,
    )
    assert got["https://allowed.com/privateer"] == (
        False,
        REASON_ROBOTS_PATH_DISALLOWED,
    )
    assert got["https://allowed.com/tmp"] == (True, REASON_KEPT)
    assert got["https://allowed.com/tmp/x"] == (False, REASON_ROBOTS_PATH_DISALLOWED)
    assert got["https://blockall.com/anything"] == (
        False,
        REASON_ROBOTS_PATH_DISALLOWED,
    )
    assert got["https://blockall.com"] == (False, REASON_ROBOTS_PATH_DISALLOWED)
    assert got["https://denied.com/public"] == (False, REASON_ROBOTS_DISALLOWED)
    assert got["https://clean.com/private"] == (True, REASON_KEPT)
    assert got["https://nullpaths.com/private"] == (True, REASON_KEPT)
    assert got["https://unknown.com/private"] == (True, REASON_KEPT)
    assert got["https://allowed.com/private?x=1"] == (
        False,
        REASON_ROBOTS_PATH_DISALLOWED,
    )


def test_reference_quirks_preserved(spark, policy):
    """The F5 no-url ⇒ keep and bad-url ⇒ drop quirks survive the
    extension unchanged."""
    pages = spark.createDataFrame([(None,), ("",), ("not a url",)], "url string")
    out = label_pages(pages, policy, exact_domain=False, enforce_paths=True)
    rows = {r["url"]: (r["keep"], r["drop_reason"]) for r in out.collect()}
    assert rows[None] == (True, REASON_KEPT)
    assert rows[""] == (True, REASON_KEPT)
    assert rows["not a url"] == (False, REASON_BAD_URL)


def test_default_mode_ignores_paths(spark, policy):
    """enforce_paths=False (the reference-parity default) must keep
    pages the extension would drop."""
    pages = spark.createDataFrame([("https://blockall.com/anything",)], "url string")
    out = label_pages(pages, policy, exact_domain=False)
    row = out.collect()[0]
    assert row["keep"] is True and row["drop_reason"] == REASON_KEPT


def test_url_path_extraction(spark):
    df = spark.createDataFrame(
        [
            ("https://a.com/x/y?q=1#f", "/x/y"),
            ("https://a.com", "/"),
            ("https://a.com:8080/doc/3", "/doc/3"),
            ("https://a.com/#frag", "/"),
        ],
        "url string, expected string",
    )
    bad = df.filter(url_path(F.col("url")) != F.col("expected")).count()
    assert bad == 0


def test_plan_stays_single_broadcast_join(spark, policy):
    """Scale guard: enforcement must not add a shuffle — still one
    BroadcastHashJoin, path check fused into the map stage."""
    pages = spark.createDataFrame([("https://allowed.com/a",)], "url string")
    out = label_pages(pages, policy, exact_domain=False, enforce_paths=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_path_disallowed_is_jvm_expression(spark):
    """path_disallowed compiles to exists/startswith — a pure Column
    expression (no Python UDF node in the plan)."""
    df = spark.createDataFrame(
        [("/a/b", ["/a"]), ("/c", ["/a"])],
        StructType(
            [
                StructField("p", StringType()),
                StructField("rules", ArrayType(StringType())),
            ]
        ),
    )
    out = df.select(path_disallowed(F.col("p"), F.col("rules")).alias("blocked"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert [r["blocked"] for r in out.collect()] == [True, False]
