"""Bloom-gated incremental dedup (operators/bloom.py).

Covers the invariants that make the operator trustworthy at scale:
no false negatives ever, deterministic (engine-portable) positions,
partitioning-independent build, the tree combine, null keys, and the
false-positive accounting under a deliberately undersized filter.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from fineweb_domain_analyzer_spark.operators.bloom import (
    bloom_fpp,
    bloom_gate_new_dump,
    bloom_m_for,
    bloom_positions,
    build_bloom,
    with_bloom_hit,
)


def _py_positions(key: str, k: int, m: int) -> list[int]:
    """Pure-python mirror of the md5 position family (the q74 oracle)."""
    return [
        int(hashlib.md5(f"{key}#{i}".encode()).hexdigest()[:8], 16) % m
        for i in range(1, k + 1)
    ]


def _py_bloom(keys: list[str], k: int, m: int) -> set[int]:
    out: set[int] = set()
    for u in keys:
        out.update(_py_positions(u, k, m))
    return out


def _py_hit(key: str, bits: set[int], k: int, m: int) -> bool:
    return all(p in bits for p in _py_positions(key, k, m))


URLS = [f"https://s{i % 7}.example.com/p/{i}" for i in range(400)]
NOVEL = [f"https://new{i}.example.org/x/{i}" for i in range(200)]


def test_sizing_and_fpp():
    assert bloom_m_for(0) == 1024
    assert bloom_m_for(4000, 16) == 65536
    assert bloom_m_for(4096, 16) == 65536  # exact power of two: no bump
    assert bloom_m_for(4097, 16) == 131072
    assert bloom_fpp(0, 1024, 5) == 0.0
    # analytic curve is monotone in n and bounded in (0, 1)
    assert 0 < bloom_fpp(100, 1024, 5) < bloom_fpp(1000, 1024, 5) < 1


def test_position_params_validated(spark):
    with pytest.raises(ValueError):
        bloom_positions(F.lit("x"), k=0, m=1024)
    with pytest.raises(ValueError):
        bloom_positions(F.lit("x"), k=5, m=1000)  # not a power of two


def test_positions_match_python_md5_family(spark):
    m, k = 4096, 5
    df = spark.createDataFrame([(u,) for u in URLS[:50]], "url string")
    got = df.select(
        "url", bloom_positions(F.col("url"), k=k, m=m).alias("pos")
    ).collect()
    for row in got:
        assert list(row.pos) == _py_positions(row.url, k, m)


def test_no_false_negatives_and_fp_accounting(spark):
    # deliberately undersized filter (m = 1024 for 400 keys) so false
    # positives MUST appear — the accounting has to label them exactly
    m, k = 1024, 5
    old = spark.createDataFrame([(u,) for u in URLS], "url string")
    new = spark.createDataFrame(
        [(i, u) for i, u in enumerate(URLS[:100] + NOVEL)],
        "doc_id long, url string",
    )
    out = bloom_gate_new_dump(
        old, new, "url", m=m, k=k, verify_exact=True
    ).collect()
    bits = _py_bloom(URLS, k, m)
    n_fp = 0
    for r in out:
        if r.exact_hit:  # seen url: a bloom filter can NEVER miss it
            assert r.bloom_hit is True and r.false_positive is False
        else:
            assert r.bloom_hit == _py_hit(r.url, bits, k, m)
            assert r.false_positive == r.bloom_hit
            n_fp += int(r.false_positive)
    # fill factor ~0.86 at kn/m ≈ 2 → fp rate near (0.86)^5 ≈ 0.47;
    # with 200 novel urls a zero-fp run would mean the plant failed
    assert n_fp > 0
    analytic = bloom_fpp(len(URLS), m, k)
    assert abs(n_fp / len(NOVEL) - analytic) < 0.2


def test_build_is_partitioning_independent(spark):
    m, k = 8192, 5
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    one = build_bloom(df.repartition(1), "url", m=m, k=k)
    many = build_bloom(df.repartition(7), "url", m=m, k=k)
    assert one == many
    # and identical to the pure-python bit set
    bits = _py_bloom(URLS, k, m)
    got = {
        i * 8 + b
        for i, byte in enumerate(one)
        for b in range(8)
        if byte >> b & 1
    }
    assert got == bits


def test_tree_combine_equals_flat(spark):
    m, k = 8192, 5
    df = spark.createDataFrame([(u,) for u in URLS], "url string").repartition(8)
    assert build_bloom(df, "url", m=m, k=k) == build_bloom(
        df, "url", m=m, k=k, tree_fanout=3
    )


def test_null_keys_skipped_and_flagged_null(spark):
    m, k = 1024, 5
    old = spark.createDataFrame(
        [("https://a.example.com/1",), (None,)], "url string"
    )
    filt = build_bloom(old, "url", m=m, k=k)
    new = spark.createDataFrame(
        [(1, "https://a.example.com/1"), (2, None)], "doc_id long, url string"
    )
    rows = {
        r.doc_id: r.bloom_hit
        for r in with_bloom_hit(new, filt, "url", k=k).collect()
    }
    assert rows[1] is True
    assert rows[2] is None


def test_with_bloom_hit_rejects_bad_filter_length(spark):
    df = spark.createDataFrame([("x",)], "url string")
    with pytest.raises(ValueError):
        with_bloom_hit(df, b"\x00" * 100, "url", k=5)  # 800 bits: not 2^j


def test_empty_old_corpus(spark):
    old = spark.createDataFrame([], "url string")
    new = spark.createDataFrame([(1, "https://x/1")], "doc_id long, url string")
    out = bloom_gate_new_dump(old, new, "url", verify_exact=True).collect()
    assert len(out) == 1
    assert out[0].bloom_hit is False and out[0].exact_hit is False
