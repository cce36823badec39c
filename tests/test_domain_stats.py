"""Stage-2 domain aggregation vs the reference's domains_detailed golden
(SURVEY §5.3) + salted-variant equivalence."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from fineweb_domain_analyzer_spark.operators.domain_stats import (
    distinct_domains,
    domain_stats,
    domain_stats_salted,
)
from fineweb_domain_analyzer_spark.operators.filtering import with_domain
from fineweb_domain_analyzer_spark.sources.jsonl import read_jsonl_with_raw


@pytest.fixture(scope="module")
def pages(spark, fixtures_dir):
    df = read_jsonl_with_raw(spark, str(fixtures_dir / "test_data.jsonl"))
    # reference stage 2 skips rows without url (line 172)
    return with_domain(df.filter(F.col("url").isNotNull() & (F.col("url") != ""))).cache()


@pytest.fixture(scope="module")
def golden(fixtures_dir):
    with open(fixtures_dir / "domains_detailed_20250724_132950.json") as f:
        return json.load(f)["domains"]


def test_counts_and_tld_match_golden(pages, golden):
    rows = {r["domain"]: r for r in domain_stats(pages, order_col="id").collect()}
    assert set(rows) == set(golden)
    for dom, g in golden.items():
        assert rows[dom]["count"] == g["count"], dom
        assert rows[dom]["tld"] == g["tld"], dom


def test_top5_urls_match_golden_as_sets(pages, golden):
    """The reference keeps the FIRST 5 urls in input order; our engine
    keeps a deterministic 5 (ordered by id, which encodes input order
    in the fixtures: '<stem>_<N>'). For domains with ≤5 rows the sets
    must match exactly; for >5-row domains ours must be a subset check
    on length only (order key differs: lexicographic id vs numeric)."""
    rows = {r["domain"]: r for r in domain_stats(pages, order_col="id").collect()}
    for dom, g in golden.items():
        ours = rows[dom]["urls"]
        assert len(ours) == len(g["urls"]), dom
        if g["count"] <= 5:
            assert sorted(ours) == sorted(g["urls"]), dom


def test_salted_equals_plain(pages):
    plain = {
        (r["domain"], r["count"], tuple(r["urls"])): 1
        for r in domain_stats(pages, order_col="id").collect()
    }
    salted = {
        (r["domain"], r["count"], tuple(r["urls"])): 1
        for r in domain_stats_salted(pages, n_salts=4, order_col="id").collect()
    }
    assert plain == salted


def test_distinct_domains_matches_simple_golden(pages, fixtures_dir):
    with open(fixtures_dir / "domains_simple_20250724_132950.json") as f:
        golden = json.load(f)["domains"]
    ours = sorted(r["domain"] for r in distinct_domains(pages).collect())
    assert ours == sorted(golden)


def test_hot_domain_bounded_top5(spark):
    """One domain holding >50% of rows (Zipf head): the bounded window
    path must return the exact smallest-5 and agree with the salted
    variant. Guards the no-unbounded-collect default (VERDICT r1 §3)."""
    n = 2000
    rows = spark.range(n).select(
        F.when(F.col("id") < 1200, F.lit("hot.example.com"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 97).cast("string"), F.lit(".example.com")))
        .alias("domain"),
        F.format_string("https://x/%05d", F.col("id")).alias("url"),
    )
    plain = {r["domain"]: r for r in domain_stats(rows).collect()}
    hot = plain["hot.example.com"]
    assert hot["count"] == 1200
    assert hot["urls"] == [f"https://x/{i:05d}" for i in range(5)]
    salted = {r["domain"]: r for r in domain_stats_salted(rows, n_salts=8).collect()}
    assert {d: (r["count"], tuple(r["urls"])) for d, r in plain.items()} == {
        d: (r["count"], tuple(r["urls"])) for d, r in salted.items()
    }


def test_empty_string_timestamp_falls_back_to_run_ts(spark):
    """Reference semantics: `record.get('timestamp') or now()` — an
    EMPTY-string timestamp must fall back, not propagate '' into
    first/last_seen (ADVICE r1)."""
    rows = spark.createDataFrame(
        [
            ("a.com", "u1", ""),
            ("a.com", "u2", None),
            ("b.com", "u3", "2025-01-02T00:00:00"),
        ],
        "domain string, url string, ts string",
    )
    out = {
        r["domain"]: r
        for r in domain_stats(rows, ts_col="ts", run_ts="RUNTS").collect()
    }
    assert out["a.com"]["first_seen"] == "RUNTS"
    assert out["a.com"]["last_seen"] == "RUNTS"
    assert out["b.com"]["first_seen"] == "2025-01-02T00:00:00"
    salted = {
        r["domain"]: r
        for r in domain_stats_salted(rows, ts_col="ts", run_ts="RUNTS").collect()
    }
    assert salted["a.com"]["first_seen"] == "RUNTS"
