"""JSONL compat reader semantics (S3/S4): blank-line skip, malformed
log-and-skip, raw-line retention."""

from __future__ import annotations

import pytest

from fineweb_domain_analyzer_spark.sources.jsonl import read_jsonl_with_raw


@pytest.fixture(scope="module")
def messy_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("jsonl") / "messy.jsonl"
    lines = [
        '{"id":"a","url":"https://x.com/1","text":"t"}',
        "",
        "   ",
        "{not json at all",            # reference: JSONDecodeError → skip
        '"just a string"',             # valid JSON, not an object → skip
        '{"id":"b","text":"no url"}',  # sparse but valid → keep
    ]
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(p)


def test_blank_and_malformed_skipped(spark, messy_path):
    df = read_jsonl_with_raw(spark, messy_path)
    rows = {r["id"] for r in df.collect()}
    assert rows == {"a", "b"}


def test_raw_column_is_verbatim(spark, messy_path):
    rows = {r["id"]: r["raw"] for r in read_jsonl_with_raw(spark, messy_path).collect()}
    assert rows["a"] == '{"id":"a","url":"https://x.com/1","text":"t"}'
    assert rows["b"] == '{"id":"b","text":"no url"}'


def test_empty_file(spark, tmp_path):
    p = tmp_path / "empty.jsonl"
    p.write_text("")
    assert read_jsonl_with_raw(spark, str(p)).count() == 0


def test_max_records_per_file_bounds_output_shards(spark, tmp_path):
    """maxRecordsPerFile must roll output files at the cap without a
    repartition: 100 rows in one task with cap 10 -> >= 10 files, and
    content is unchanged vs the uncapped write."""
    import glob

    from fineweb_domain_analyzer_spark.sources.jsonl import (
        write_jsonl_passthrough,
    )

    df = (
        spark.range(100)
        .coalesce(1)
        .selectExpr("true as keep", "concat('line-', id) as raw")
    )
    capped = tmp_path / "capped"
    free = tmp_path / "free"
    write_jsonl_passthrough(df, str(capped), max_records_per_file=10)
    write_jsonl_passthrough(df, str(free))

    def lines(root):
        out = []
        for f in glob.glob(str(root / "keep=true" / "*.txt")):
            out.extend(open(f).read().splitlines())
        return sorted(out)

    n_capped = len(glob.glob(str(capped / "keep=true" / "*.txt")))
    n_free = len(glob.glob(str(free / "keep=true" / "*.txt")))
    assert n_capped >= 10  # 100 rows / cap 10
    assert n_free == 1  # single task, no cap -> single file
    assert lines(capped) == lines(free)
