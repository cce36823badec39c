"""Segment-level language consistency (functions/textfns.py:
with_lang_consistency): mixed-language detection by 25-token-window
langid — the CCNet paragraph-langid idea for break-free extracted
text."""

from __future__ import annotations

import pytest

from fineweb_domain_analyzer_spark.functions.textfns import (
    LANG_STOPWORDS,
    with_lang_consistency,
)

# build strongly-identified segment text from the actual stopword lists
EN = " ".join((LANG_STOPWORDS["en"] * 5)[:25])
DE = " ".join((LANG_STOPWORDS["de"] * 5)[:25])
NOISE = " ".join(["zzz"] * 25)


def summarize(spark, text, seg_tokens=25):
    df = spark.createDataFrame([(1, text)], "id int, text string")
    return with_lang_consistency(df, seg_tokens=seg_tokens).collect()[0]


class TestConsistency:
    def test_pure_doc(self, spark):
        r = summarize(spark, f"{EN} {EN} {EN}")
        assert r["n_segments"] == 3
        assert r["majority_lang"] == "en"
        assert r["majority_frac"] == 1.0
        assert r["n_langs"] == 1
        assert r["lang_mixed"] is False

    def test_mixed_doc(self, spark):
        r = summarize(spark, f"{EN} {EN} {DE}")
        assert r["n_segments"] == 3
        assert r["majority_lang"] == "en"
        assert r["majority_frac"] == 0.6667
        assert r["n_langs"] == 2
        assert r["lang_mixed"] is True

    def test_unk_segments(self, spark):
        r = summarize(spark, f"{NOISE} {EN}")
        assert r["n_segments"] == 2
        assert r["n_langs"] == 2
        assert sorted([r["majority_lang"]]) in (["en"], ["unk"])

    def test_partial_last_segment(self, spark):
        # 30 tokens → segments of 25 + 5
        r = summarize(spark, " ".join((LANG_STOPWORDS["en"] * 10)[:30]))
        assert r["n_segments"] == 2
        assert r["majority_lang"] == "en"

    def test_empty_and_null(self, spark):
        for t in ("", None):
            df = spark.createDataFrame([(1, t)], "id int, text string")
            r = with_lang_consistency(df).collect()[0]
            assert r["n_segments"] == 0
            assert r["majority_lang"] == "unk"
            assert r["majority_frac"] == 0.0
            assert r["n_langs"] == 0
            assert r["lang_mixed"] is False

    def test_tie_breaks_by_langid_order(self, spark):
        # one EN segment + one DE segment: tie → 'en' (first in order)
        r = summarize(spark, f"{EN} {DE}")
        assert r["majority_lang"] == "en"

    def test_zero_exchanges(self, spark):
        from fineweb_domain_analyzer_spark.queries import q106_lang_consistency

        plan = (
            q106_lang_consistency(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_corpus_discriminates(self, spark):
        from pyspark.sql import functions as F

        from fineweb_domain_analyzer_spark.queries import q106_lang_consistency

        mix = (
            q106_lang_consistency(spark, "/root/testdata/sf0.001")
            .groupBy("lang_mixed")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        got = {r["lang_mixed"]: r["n"] for r in mix}
        assert got.get(True, 0) > 0 and got.get(False, 0) > 0
