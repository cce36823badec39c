"""Driver-contract smoke: entry() runs, queries()/oracle_sql() align."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "domain", "keep", "drop_reason"}


def test_every_query_has_oracle():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    missing = set(qs) - set(oracles)
    # every SQL-expressible query is oracle-checked (q37's fixpoint has
    # a recursive-CTE oracle). Sole exception: q58's zlib compression
    # ratio has no DuckDB equivalent — the driver records its rows-only
    # check and tests/test_quality_scrub.py verifies values vs zlib.
    assert missing == {"q58_compression_ratio"}, (
        f"unexpected oracle coverage change: {missing}"
    )
    extra = set(oracles) - set(qs)
    assert not extra, f"oracles without query: {extra}"


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_at_sf0001(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, str(sf_dir))
    assert df.count() >= 0
