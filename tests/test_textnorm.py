"""Unicode normalization stage (functions/textfns.py:normalize_text)."""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from fineweb_domain_analyzer_spark.functions.textfns import normalize_text


def _norm(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "text string")
    return [r.n for r in df.select(normalize_text(F.col("text")).alias("n")).collect()]


def test_nfc_composes_combining_sequences(spark):
    assert _norm(spark, ["Café"]) == ["Café"]


def test_control_and_format_chars_stripped(spark):
    got = _norm(spark, ["a\x00b\x08c\u200bd\u200ce\u200df\ufeffg"])
    assert got == ["abcdefg"]


def test_nbsp_and_whitespace_collapse(spark):
    got = _norm(spark, ["  a  b\t\tc\r\nd  "])
    assert got == ["a b c d"]


def test_ascii_passthrough_and_null(spark):
    got = _norm(spark, ["plain ascii text.", None, ""])
    assert got == ["plain ascii text.", None, ""]


def test_idempotent(spark):
    messy = "\tCafe\u0301 \u200bX\u00a0Y \r\n end  "
    once = _norm(spark, [messy])[0]
    assert _norm(spark, [once]) == [once]
    assert once == unicodedata.normalize("NFC", once)
