"""DSIR importance weighting (operators/dsir.py) and the per-group
diversity cap (operators/quality.py keep_top_n_by_group)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fineweb_domain_analyzer_spark.operators.dsir import (
    dsir_logweight,
    dsir_select,
    expected_weight_py,
    hashed_ngram_counts,
)
from fineweb_domain_analyzer_spark.operators.quality import keep_top_n_by_group

DOCS = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "alpha beta gamma delta alpha beta",
    3: "completely unrelated text about pyspark shuffles and  joins",
    4: "alpha beta gamma epsilon zeta",
    5: " leading spaces\nand a newline\tand a tab inside ",
    6: "",
}
TARGET = ["alpha beta gamma gamma", "alpha beta delta"]


def _docs_df(spark, extra_null: bool = False):
    rows = [(i, t) for i, t in DOCS.items()]
    if extra_null:
        rows.append((99, None))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _target_df(spark):
    return spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(TARGET)], "doc_id long, text string"
    )


def test_dsir_weight_matches_python_differential(spark):
    """The exact-integer micro-nat weight must equal a from-scratch
    hashlib+math.log recomputation — hash family, tokenizer (spaces
    trimmed, \\n and \\t NOT trimmed), smoothing, quantization and the
    integer per-doc sum all agree or this fails."""
    got = {
        r["doc_id"]: r["dsir_weight_micro"]
        for r in dsir_logweight(
            _docs_df(spark), _target_df(spark), n_buckets=64
        ).collect()
    }
    want = expected_weight_py(DOCS, TARGET, n_buckets=64)
    assert got == want


def test_dsir_null_text_weighs_zero(spark):
    got = {
        r["doc_id"]: r["dsir_weight_micro"]
        for r in dsir_logweight(
            _docs_df(spark, extra_null=True), _target_df(spark), n_buckets=64
        ).collect()
    }
    assert got[99] == 0
    assert len(got) == len(DOCS) + 1


def test_dsir_prefers_target_like_docs(spark):
    """Docs sharing the target's n-grams must outweigh unrelated docs —
    the whole point of importance resampling."""
    got = {
        r["doc_id"]: r["dsir_weight_micro"]
        for r in dsir_logweight(
            _docs_df(spark), _target_df(spark), n_buckets=4096
        ).collect()
    }
    # 2 and 4 contain 'alpha beta'/'gamma' target grams; 1 and 3 do not
    assert min(got[2], got[4]) > max(got[1], got[3])


def test_dsir_select_banded_equals_exact(spark):
    docs = _docs_df(spark)
    tgt = _target_df(spark)
    kept_banded = {
        r["doc_id"]
        for r in dsir_select(docs, tgt, 50, n_buckets=64, banded=True).collect()
    }
    kept_exact = {
        r["doc_id"]
        for r in dsir_select(docs, tgt, 50, n_buckets=64, banded=False).collect()
    }
    assert kept_banded == kept_exact
    assert len(kept_banded) == len(DOCS) // 2


def test_hashed_ngram_counts_shapes(spark):
    counts = hashed_ngram_counts(_docs_df(spark), n_buckets=64)
    row1 = counts.filter(F.col("doc_id") == 1).agg(F.sum("cnt")).collect()[0][0]
    # doc 1: 9 tokens -> 9 unigrams + 8 bigrams
    assert row1 == 17
    # empty text -> the single empty token is one unigram, no bigrams
    row6 = counts.filter(F.col("doc_id") == 6).agg(F.sum("cnt")).collect()[0][0]
    assert row6 == 1


def _cap_frame(spark):
    """Dominant group 'a' (30 rows), small group 'b' (3), null group (5);
    duplicate scores force the (score desc, id) tiebreak."""
    rows = (
        [(i, "a", float(i % 7)) for i in range(30)]
        + [(100 + i, "b", 1.0) for i in range(3)]
        + [(200 + i, None, float(i)) for i in range(5)]
    )
    return spark.createDataFrame(rows, "doc_id long, grp string, score double")


def test_keep_top_n_banded_equals_exact(spark):
    df = _cap_frame(spark)
    for n in (0, 2, 4, 30):
        banded = {
            r["doc_id"]
            for r in keep_top_n_by_group(
                df, n, score_col="score", by_col="grp", id_col="doc_id",
                banded=True, n_bands=4,
            ).collect()
        }
        exact = {
            r["doc_id"]
            for r in keep_top_n_by_group(
                df, n, score_col="score", by_col="grp", id_col="doc_id",
                banded=False,
            ).collect()
        }
        assert banded == exact, f"n={n}"
        # cap actually binds per group, null group included
        assert len(banded) == min(n, 30) + min(n, 3) + min(n, 5)


def test_keep_top_n_no_whole_group_window(spark):
    """Plan assertion: the banded cap's only window partitions by
    (group, band) — no single-task whole-group sort survives."""
    df = _cap_frame(spark)
    plan = keep_top_n_by_group(
        df, 2, score_col="score", by_col="grp", id_col="doc_id", banded=True
    )._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "_band" in m.group(1), m.group(0)
