"""C4-style line-level cleaning + Gopher duplicate-line statistics.

The reference has no text cleaning at all (its filter is domain-granular,
/root/reference/fineweb_analyzer.py:436-464); these operators are part of
the north-rule "Gopher/C4-style heuristic rules" layer (BASELINE.json
north_star) — the line-granular half that complements the document-level
features in operators/quality.py.

All of it is pure Column expressions over the line array (split once,
then filter/transform/aggregate on the array) — one map stage, no
shuffle, no Python. At 100 TB this is the ideal shape: the whole clean
runs inside whole-stage codegen alongside the scan.

C4 (Raffel et al. 2020, §2.2) line rules implemented:
  * keep only lines ending in terminal punctuation (. ! ? ")
  * drop lines with fewer than `min_words` words
  * drop lines containing boilerplate markers (javascript/cookie/
    lorem ipsum policy phrases)

Gopher (Rae et al. 2021, table A1) repetition signal implemented:
  * duplicate-line fraction = 1 - distinct_lines / lines
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TERMINAL_PUNCT = (".", "!", "?", '"')

# C4 drops any line containing these (lowercased substring match).
DEFAULT_BANNED_PHRASES: tuple[str, ...] = (
    "javascript",
    "cookie",
    "lorem ipsum",
    "privacy policy",
    "terms of use",
)


def split_lines(text: Column) -> Column:
    """Non-empty trimmed lines as array<string> (split on '\\n')."""
    return F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )


def _line_word_count(line: Column) -> Column:
    return F.size(F.split(line, r"\s+"))


def c4_line_keep(line: Column, min_words: int = 3,
                 banned: tuple[str, ...] = DEFAULT_BANNED_PHRASES) -> Column:
    """C4 keep predicate for one (trimmed, non-empty) line."""
    last_char = F.substring(line, F.length(line).cast("int"), 1)
    ends_ok = last_char.isin(*TERMINAL_PUNCT)
    long_enough = _line_word_count(line) >= min_words
    lowered = F.lower(line)
    not_banned = F.lit(True)
    for phrase in banned:
        not_banned = not_banned & (F.instr(lowered, phrase) == 0)
    return ends_ok & long_enough & not_banned


def c4_clean_lines(text: Column, min_words: int = 3,
                   banned: tuple[str, ...] = DEFAULT_BANNED_PHRASES) -> Column:
    """Kept lines after the C4 rules, as array<string>."""
    return F.filter(
        split_lines(text), lambda l: c4_line_keep(l, min_words, banned)
    )


def c4_clean_text(text: Column, min_words: int = 3,
                  banned: tuple[str, ...] = DEFAULT_BANNED_PHRASES) -> Column:
    """Cleaned text: kept lines re-joined with '\\n'."""
    return F.array_join(c4_clean_lines(text, min_words, banned), "\n")


def dup_line_fraction(text: Column) -> Column:
    """Gopher duplicate-line fraction: 1 - distinct/total over non-empty
    trimmed lines; 0.0 for line-less documents."""
    lines = split_lines(text)
    n = F.size(lines)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(1.0 - F.size(F.array_distinct(lines)) / n, 4)
    )


def with_line_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
    banned: tuple[str, ...] = DEFAULT_BANNED_PHRASES,
) -> DataFrame:
    """Adds: lines_total, lines_kept, dup_line_fraction, cleaned_text.

    Stages the line array and kept-line array as their own columns so
    codegen methods stay small (same rationale as
    quality.with_quality_features) and each array is computed once.
    """
    text = F.col(text_col)
    df = df.withColumn("_lc_lines", split_lines(text))
    df = df.withColumn(
        "_lc_kept",
        F.filter(F.col("_lc_lines"), lambda l: c4_line_keep(l, min_words, banned)),
    )
    n = F.size("_lc_lines")
    return (
        df.withColumn("lines_total", n.cast("bigint"))
        .withColumn("lines_kept", F.size("_lc_kept").cast("bigint"))
        .withColumn(
            "dup_line_fraction",
            F.when(n == 0, F.lit(0.0)).otherwise(
                F.round(1.0 - F.size(F.array_distinct("_lc_lines")) / n, 4)
            ),
        )
        .withColumn("cleaned_text", F.array_join("_lc_kept", "\n"))
        .drop("_lc_lines", "_lc_kept")
    )
