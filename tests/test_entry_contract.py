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
    # the driver's correctness gate records only the first 50 sorted
    # keys — the exposed registry must fit entirely inside that window
    assert len(qs) <= 50, f"exposed registry too large: {len(qs)} keys"
    # every exposed query is value-oracle-checked, no exceptions: the
    # zlib compression ratio (not SQL-expressible) is verified through
    # the committed artifacts/zlib_ratio.parquet fixture join inside
    # q13_quality_surface.
    missing = set(qs) - set(oracles)
    assert not missing, f"queries without oracle: {missing}"
    extra = set(oracles) - set(qs)
    assert not extra, f"oracles without query: {extra}"


def test_full_registry_superset():
    """The fine-grained originals stay runnable + oracle-covered
    (locally checked via FULL=1 scripts/check_oracle.py)."""
    from fineweb_domain_analyzer_spark import merged

    full_q = merged.full_queries()
    full_o = merged.full_oracle_sql()
    assert set(entrymod.queries()) <= set(full_q)
    # sole rows-only exception in the FULL registry: standalone q58
    # (zlib UDF); its values are certified by the fixture join in the
    # exposed q13_quality_surface and by tests/test_quality_scrub.py
    assert set(full_q) - set(full_o) == {"q58_compression_ratio"}


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_at_sf0001(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, str(sf_dir))
    assert df.count() >= 0
