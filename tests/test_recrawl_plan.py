"""Crawl-delay recrawl budgeting (functions/robots.py:recrawl_plan).

The reference parses Crawl-delay into the policy
(fineweb_analyzer.py:287-290) but never consumes it; recrawl_plan is
the extension that turns it into a per-domain fetch schedule.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from fineweb_domain_analyzer_spark.functions.robots import recrawl_plan

POLICY_SCHEMA = StructType(
    [
        StructField("domain", StringType()),
        StructField("crawl_allowed", BooleanType()),
        StructField("crawl_delay", DoubleType()),
    ]
)

COUNTS_SCHEMA = StructType(
    [
        StructField("domain", StringType()),
        StructField("page_cnt", LongType()),
    ]
)


@pytest.fixture(scope="module")
def plan_rows(spark):
    policy = spark.createDataFrame(
        [
            ("slow.com", True, 10.0),     # 360 fetches/h
            ("fast.com", True, 0.5),      # 7200 fetches/h
            ("nodelay.com", True, None),  # default 1.0 -> 3600/h
            ("zero.com", True, 0.0),      # non-positive delay -> default
            ("denied.com", False, 2.0),   # no budget at all
        ],
        POLICY_SCHEMA,
    )
    counts = spark.createDataFrame(
        [
            ("slow.com", 720),
            ("fast.com", 720),
            ("nodelay.com", 3600),
            ("zero.com", 1),
            ("denied.com", 50),
            ("unknown.com", 4000),  # not in policy: default-allow
        ],
        COUNTS_SCHEMA,
    )
    out = recrawl_plan(counts, policy, window_s=3600.0, default_delay=1.0)
    return {r["domain"]: r.asDict() for r in out.collect()}


def test_budget_math(plan_rows):
    slow = plan_rows["slow.com"]
    assert slow["max_fetches_per_window"] == 360
    assert slow["windows_needed"] == 2  # ceil(720/360)
    assert slow["over_budget"] is True

    fast = plan_rows["fast.com"]
    assert fast["max_fetches_per_window"] == 7200
    assert fast["windows_needed"] == 1
    assert fast["over_budget"] is False


def test_default_delay_applied(plan_rows):
    for d in ("nodelay.com", "zero.com"):
        assert plan_rows[d]["delay_s"] == 1.0
        assert plan_rows[d]["max_fetches_per_window"] == 3600
    # exactly at budget is NOT over budget
    assert plan_rows["nodelay.com"]["windows_needed"] == 1
    assert plan_rows["nodelay.com"]["over_budget"] is False


def test_denied_domain_gets_no_schedule(plan_rows):
    denied = plan_rows["denied.com"]
    assert denied["fetchable"] is False
    assert denied["max_fetches_per_window"] == 0
    assert denied["windows_needed"] is None
    assert denied["over_budget"] is True


def test_unknown_domain_default_allow(plan_rows):
    unk = plan_rows["unknown.com"]
    assert unk["fetchable"] is True
    assert unk["delay_s"] == 1.0
    assert unk["max_fetches_per_window"] == 3600
    assert unk["windows_needed"] == 2  # ceil(4000/3600)
    assert unk["over_budget"] is True


def test_plan_is_broadcast_join(spark):
    """Scale guard: the policy side is broadcast — no shuffle of the
    (already tiny) counts side beyond what the caller produced."""
    policy = spark.createDataFrame([("a.com", True, 1.0)], POLICY_SCHEMA)
    counts = spark.createDataFrame([("a.com", 10)], COUNTS_SCHEMA)
    out = recrawl_plan(counts, policy)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
