"""Context-window chunking tests: window/stride coverage, short and
empty docs, overlap content, parameter validation, zero-shuffle plan."""

from __future__ import annotations

import hashlib

import pytest

from fineweb_domain_analyzer_spark.operators.chunking import chunk_documents


def _chunks(spark, text, window=4, stride=3):
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    return sorted(
        chunk_documents(df, window=window, stride=stride).collect(),
        key=lambda r: r["chunk_id"],
    )


def test_chunking_windows_and_overlap(spark):
    """10 tokens, window 4, stride 3 → starts 0,3,6,9; the last chunk
    is the 1-token tail; consecutive chunks overlap by 1 token."""
    toks = [f"t{i}" for i in range(10)]
    rows = _chunks(spark, " ".join(toks))
    assert [r["chunk_id"] for r in rows] == [0, 1, 2, 3]
    assert [r["chunk_tokens"] for r in rows] == [4, 4, 4, 1]
    expected = [toks[0:4], toks[3:7], toks[6:10], toks[9:10]]
    for r, exp in zip(rows, expected):
        assert r["chunk_hash"] == hashlib.md5(
            " ".join(exp).encode()
        ).hexdigest()


def test_chunking_edges(spark):
    """A doc shorter than the window yields exactly one chunk; blank
    docs yield none; uppercase folds (ws_tokens lowercases); bad
    stride raises."""
    assert len(_chunks(spark, "a b")) == 1
    assert _chunks(spark, "a b")[0]["chunk_tokens"] == 2
    assert _chunks(spark, "   ") == []
    assert _chunks(spark, "A b")[0]["chunk_hash"] == hashlib.md5(
        b"a b"
    ).hexdigest()
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, window=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(df, stride=0)


def test_chunking_zero_shuffle_plan(spark):
    """The whole chunking is one map stage: no Exchange anywhere."""
    df = spark.createDataFrame(
        [(i, "w " * 100) for i in range(10)], "doc_id bigint, text string"
    )
    plan = (
        chunk_documents(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
