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


class TestMojibakeRepair:
    """ftfy-lite encoding repair (functions/textfns.py:
    fix_mojibake_text / with_mojibake_fix)."""

    CASES = [
        ("café — déjà vu", True),          # latin-1 view of utf-8
        ("naïve façade über", True),
        ("plain ascii text", False),        # corruption is identity
    ]

    def test_round_trip_restores(self):
        from fineweb_domain_analyzer_spark.functions.textfns import (
            corrupt_utf8_as_latin1,
            fix_mojibake_text,
        )

        for orig, changes in self.CASES:
            cor = corrupt_utf8_as_latin1(orig)
            assert (cor != orig) is changes
            assert fix_mojibake_text(cor) == orig

    def test_clean_text_untouched(self):
        from fineweb_domain_analyzer_spark.functions.textfns import (
            fix_mojibake_text,
        )

        for s in ("hello world", "héllo wörld", "", "€ 20 — fine"):
            assert fix_mojibake_text(s) == s
        assert fix_mojibake_text(None) is None

    def test_cp1252_punctuation_path(self):
        from fineweb_domain_analyzer_spark.functions.textfns import (
            fix_mojibake_text,
        )

        # u2019 apostrophe through the cp1252 mis-decode: 'it\u2019s' ->
        # 'it\u00e2\u20ac\u2122s'
        cor = "it\u00e2\u20ac\u2122s fine"
        assert fix_mojibake_text(cor) == "it\u2019s fine"

    def test_spark_operator(self, spark):
        from pyspark.sql import functions as F

        from fineweb_domain_analyzer_spark.functions.textfns import (
            corrupt_utf8_as_latin1,
            with_mojibake_fix,
        )

        rows = [
            (1, corrupt_utf8_as_latin1("caf\u00e9 au lait")),
            (2, "already clean"),
            (3, None),
        ]
        df = spark.createDataFrame(rows, "id int, text string")
        got = {r["id"]: r for r in with_mojibake_fix(df).collect()}
        assert got[1]["fixed_text"] == "caf\u00e9 au lait"
        assert got[1]["mojibake_fixed"] is True
        assert got[2]["fixed_text"] == "already clean"
        assert got[2]["mojibake_fixed"] is False
        assert got[3]["fixed_text"] is None
        assert got[3]["mojibake_fixed"] is False
