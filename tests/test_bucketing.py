"""Bucketed tables eliminate shuffles for repeated key-joins/aggs —
verified at the PHYSICAL PLAN level (Exchange count), not just by
results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fineweb_domain_analyzer_spark.plans.bucketing import (
    n_exchanges,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    pages = spark.range(2000).select(
        F.concat(F.lit("d"), (F.col("id") % 37).cast("string")).alias("domain"),
        F.concat(F.lit("https://x/"), F.col("id").cast("string")).alias("url"),
    )
    policy = spark.range(37).select(
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("domain"),
        (F.col("id") % 2 == 0).alias("crawl_allowed"),
    )
    write_bucketed(pages, "pages_b", "domain", n_buckets=8, path=str(wh / "pages_b"))
    write_bucketed(policy, "policy_b", "domain", n_buckets=8, path=str(wh / "policy_b"))
    yield "pages_b", "policy_b"
    spark.sql("DROP TABLE IF EXISTS pages_b")
    spark.sql("DROP TABLE IF EXISTS policy_b")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    pages = read_bucketed(spark, bucketed_tables[0])
    agg = pages.groupBy("domain").agg(F.count(F.lit(1)).alias("cnt"))
    assert n_exchanges(agg) == 0
    # and the aggregation is still correct
    rows = {r["domain"]: r["cnt"] for r in agg.collect()}
    assert sum(rows.values()) == 2000


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """Equi-join of two same-bucketed tables: co-located, zero shuffle.
    AQE is disabled for the assertion because it can re-plan the tiny
    side as a broadcast (also shuffle-free, but not what we're pinning)."""
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        pages = read_bucketed(spark, bucketed_tables[0])
        policy = read_bucketed(spark, bucketed_tables[1])
        joined = pages.join(policy, "domain")
        assert n_exchanges(joined) == 0
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_unbucketed_baseline_does_shuffle(spark):
    """Sanity: the same agg over a NON-bucketed source has an Exchange
    (so the zero-Exchange assertions above are meaningful)."""
    pages = spark.range(2000).select(
        (F.col("id") % 37).cast("string").alias("domain")
    )
    agg = pages.groupBy("domain").agg(F.count(F.lit(1)).alias("cnt"))
    assert n_exchanges(agg) >= 1
