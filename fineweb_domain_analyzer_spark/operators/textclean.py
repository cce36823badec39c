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

import re as _re

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


def ngram_repetition_stats(tokens: Column, n: int) -> Column:
    """Gopher (Rae et al. 2021, table A1) n-gram repetition signals as
    ONE shuffle-free pass: struct(top_cnt, top_chars, dup_chars,
    total_chars) over the doc's word n-grams.

    * ``top_cnt`` / ``top_chars`` — occurrence count of the most
      frequent n-gram and the characters it covers (count × gram
      length); ties break to the lexicographically smallest gram.
    * ``dup_chars`` — characters covered by n-grams occurring ≥ 2
      times (count × length, overlaps double-counted — the standard
      relaxation; exact positional coverage needs interval union).
    * ``total_chars`` — characters across ALL n-gram occurrences
      (the fraction denominator; gram-space, not raw-doc-space, so the
      statistic is separator-convention-independent).

    Plan shape: sort the gram array, then fold run-lengths with
    ``F.aggregate`` — O(g log g) per document, entirely inside the map
    stage. The alternative explode → groupBy(doc, gram) → window plan
    shuffles every gram of the corpus twice; at 100 TB that is the
    difference between a map-only scan and the largest shuffle in the
    job. The DuckDB oracle (queries.py q44) uses the explode shape —
    same values, independent plan.

    The token column must be a MATERIALIZED array column (see
    word_shingles_from_tokens for the 18× staging rationale).
    """
    from fineweb_domain_analyzer_spark.operators.dedup import (
        word_shingles_from_tokens,
    )

    grams = F.array_sort(word_shingles_from_tokens(tokens, n))
    zero = F.lit(0).cast("long")

    def _state(prev, run, best_cnt, best_chars, dup_chars, tot):
        return F.struct(
            prev.alias("prev"),
            run.cast("long").alias("run"),
            best_cnt.cast("long").alias("best_cnt"),
            best_chars.cast("long").alias("best_chars"),
            dup_chars.cast("long").alias("dup_chars"),
            tot.cast("long").alias("tot"),
        )

    def _close_run(acc):
        """best/dup updated as if the current run just ended."""
        run_chars = acc["run"] * F.coalesce(F.length(acc["prev"]), zero).cast("long")
        is_best = acc["run"] > acc["best_cnt"]  # strict: first (lex-min) wins ties
        return (
            F.when(is_best, acc["run"]).otherwise(acc["best_cnt"]),
            F.when(is_best, run_chars).otherwise(acc["best_chars"]),
            acc["dup_chars"] + F.when(acc["run"] >= 2, run_chars).otherwise(zero),
        )

    def merge(acc, x):
        same = acc["prev"].isNotNull() & (acc["prev"] == x)
        cont = _state(
            x,
            acc["run"] + 1,
            acc["best_cnt"],
            acc["best_chars"],
            acc["dup_chars"],
            acc["tot"] + F.length(x),
        )
        best_cnt, best_chars, dup_chars = _close_run(acc)
        fresh = _state(
            x, F.lit(1), best_cnt, best_chars, dup_chars, acc["tot"] + F.length(x)
        )
        return F.when(same, cont).otherwise(fresh)

    def finish(acc):
        best_cnt, best_chars, dup_chars = _close_run(acc)
        return F.struct(
            best_cnt.alias("top_cnt"),
            best_chars.alias("top_chars"),
            dup_chars.alias("dup_chars"),
            acc["tot"].alias("total_chars"),
        )

    init = _state(F.lit(None).cast("string"), zero, zero, zero, zero, zero)
    return F.aggregate(grams, init, merge, finish)


def with_ngram_repetition(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 5,
    lower_tokens_col: str | None = None,
) -> DataFrame:
    """Adds ``top{top_n}gram_char_frac`` and ``dup{dup_n}gram_char_frac``
    (rounded 6 dp; null when the gram space is empty — e.g. blank doc).

    Gopher's reference thresholds for these two: drop when the most
    common 2-gram covers > 0.20 of characters, or duplicate 5-grams
    cover > 0.15 (Rae et al. 2021, table A1)."""
    if lower_tokens_col is None:
        df = df.withColumn("_rep_tk", ws_tokens_lower(F.col(text_col)))
        lower_tokens_col = "_rep_tk"
    toks = F.col(lower_tokens_col)
    df = df.withColumn("_rep_top", ngram_repetition_stats(toks, top_n)).withColumn(
        "_rep_dup", ngram_repetition_stats(toks, dup_n)
    )

    def _frac(s: Column, chars_field: str) -> Column:
        return F.when(
            s["total_chars"] > 0,
            F.round(s[chars_field] / s["total_chars"], 6),
        )

    return (
        df.withColumn(
            f"top{top_n}gram_char_frac", _frac(F.col("_rep_top"), "top_chars")
        )
        .withColumn(f"dup{dup_n}gram_char_frac", _frac(F.col("_rep_dup"), "dup_chars"))
        .drop("_rep_tk", "_rep_top", "_rep_dup")
    )


def ws_tokens_lower(text: Column) -> Column:
    """Lowercased whitespace tokens — the tokenization every repetition
    statistic in this module shares (and stages exactly once)."""
    from fineweb_domain_analyzer_spark.functions.textfns import ws_tokens

    return ws_tokens(F.lower(text))


def paragraph_dedup(
    df,
    paras_col: str,
    id_col: str = "doc_id",
    min_doc_freq: int = 3,
    joiner: str = "\n",
):
    """CCNet-style cross-document paragraph deduplication: a paragraph
    that appears in ``min_doc_freq`` or more distinct documents is
    boilerplate (nav bars, cookie banners, footers) and is removed
    from every document; the survivors are reassembled in original
    order. Returns ``(id, n_paras, n_removed, cleaned_text)``.

    ``paras_col`` is an ``array<string>`` column the caller prepares —
    ``F.split(text, '\\n\\n')`` for real web pages; tests chunk the
    token stream deterministically.

    Scale shape (the whole point vs the hash-per-doc dedup family:
    this one edits WITHIN documents, so it must shuffle twice):
      1. doc-frequency: explode → groupBy(paragraph) with map-side
         partial agg — the shuffle carries one row per distinct
         paragraph per partition, not per occurrence, and the key is
         content so it is skew-free by construction.
      2. reassembly: join freq back (same paragraph key → AQE can
         reuse the exchange) → groupBy(id) collecting (idx, para)
         structs, array_sort restores order without a sort exchange.
    Nothing is ever collected to the driver and per-doc state is
    O(paragraphs in that doc).
    """
    p = df.select(
        F.col(id_col), F.posexplode_outer(F.col(paras_col)).alias("idx", "para")
    )
    freq = p.groupBy("para").agg(F.countDistinct(id_col).alias("doc_freq"))
    j = p.join(freq, "para", "left")
    boiler = F.col("doc_freq") >= min_doc_freq
    kept_struct = F.when(
        F.col("para").isNotNull() & ~boiler,
        F.struct(F.col("idx"), F.col("para")),
    )
    return (
        j.groupBy(id_col)
        .agg(
            F.count(F.col("para")).alias("n_paras"),
            F.coalesce(
                F.sum(boiler.cast("long")), F.lit(0).cast("long")
            ).alias("n_removed"),
            F.array_sort(F.collect_list(kept_struct)).alias("_kept"),
        )
        .withColumn(
            "cleaned_text",
            F.array_join(F.transform(F.col("_kept"), lambda s: s["para"]), joiner),
        )
        .drop("_kept")
    )


def domain_boilerplate_removal(
    df: DataFrame,
    paras_col: str,
    domain_col: str = "source",
    id_col: str = "doc_id",
    min_ratio_bp: int = 5000,
    min_doc_freq: int = 2,
    joiner: str = "\n",
) -> DataFrame:
    """DOMAIN-scoped boilerplate strip (RefinedWeb / trafilatura-style
    per-site clean): a paragraph is boilerplate only WITHIN its own
    domain, when it appears in ≥ ``min_doc_freq`` distinct documents of
    that domain AND in at least ``min_ratio_bp`` basis points of the
    domain's documents (ratio test in exact integer arithmetic:
    ``doc_freq * 10000 >= min_ratio_bp * domain_docs`` — no float, so
    the decision is bit-identical under any partitioning and in the
    SQL oracle). The same nav bar on site A never deletes an innocent
    identical line on site B — the key difference vs the corpus-wide
    ``paragraph_dedup`` above, which a small site's legal disclaimer
    can never trip but a 2-page site's header should.

    Returns ``(id, domain, n_paras, n_removed, cleaned_text)`` with
    survivors reassembled in original order.

    Scale shape: the frequency key is (domain, paragraph-content) —
    content-salted by construction, so a Zipf head domain spreads over
    as many reducers as it has distinct paragraphs; domain_docs is a
    tiny O(domains) aggregate joined onto the O(distinct paragraphs)
    frequency frame (NOT onto the exploded occurrences); reassembly is
    the same struct-sort groupBy as ``paragraph_dedup`` — no global
    sort, no driver state.
    """
    ddocs = df.groupBy(domain_col).agg(
        F.countDistinct(id_col).alias("_domain_docs")
    )
    p = df.select(
        F.col(domain_col),
        F.col(id_col),
        F.posexplode_outer(F.col(paras_col)).alias("idx", "para"),
    )
    freq = p.groupBy(domain_col, "para").agg(
        F.countDistinct(id_col).alias("doc_freq")
    )
    boiler_flags = freq.join(ddocs, domain_col).select(
        domain_col,
        "para",
        (
            (F.col("doc_freq") >= min_doc_freq)
            & (
                F.col("doc_freq") * F.lit(10000)
                >= F.lit(min_ratio_bp) * F.col("_domain_docs")
            )
        ).alias("_boiler"),
    )
    j = p.join(boiler_flags, [domain_col, "para"], "left")
    boiler = F.coalesce(F.col("_boiler"), F.lit(False))
    kept_struct = F.when(
        F.col("para").isNotNull() & ~boiler,
        F.struct(F.col("idx"), F.col("para")),
    )
    return (
        j.groupBy(domain_col, id_col)
        .agg(
            F.count(F.col("para")).alias("n_paras"),
            F.coalesce(
                F.sum(boiler.cast("long")), F.lit(0).cast("long")
            ).alias("n_removed"),
            F.array_sort(F.collect_list(kept_struct)).alias("_kept"),
        )
        .withColumn(
            "cleaned_text",
            F.array_join(F.transform(F.col("_kept"), lambda s: s["para"]), joiner),
        )
        .drop("_kept")
    )


def dedup_paragraphs_in_doc(
    text: Column, sep: str = "\n"
) -> Column:
    """WITHIN-document duplicate-paragraph removal (the Gopher/CCNet
    pre-clean that runs BEFORE any cross-document dedup): split on
    ``sep``, keep only the FIRST occurrence of each byte-identical
    paragraph, rejoin. Templated pages repeat nav blocks / footers
    inside one page; cross-doc dedup never sees them because the
    surrounding page differs.

    Pure map expression — no shuffle, free rider on whatever scan it
    rides. Per-doc cost is O(paragraphs²) via first-index probing,
    fine at real paragraph counts (tens). Note: duplicate EMPTY
    paragraphs (consecutive separators) also collapse — blank-line
    runs shrink to one, which is the behavior the line-cleaning stage
    wants anyway."""
    # F.split takes a REGEX while F.array_join takes a literal — escape
    # the separator for the split side so metacharacter separators
    # (e.g. '.', '|') split on the intended byte sequence
    paras = F.split(text, _re.escape(sep))
    kept = F.filter(
        paras, lambda p, i: F.array_position(paras, p) == i + 1
    )
    return F.array_join(kept, sep)


def with_paragraph_dedup_in_doc(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "clean_text",
    sep: str = "\n",
) -> DataFrame:
    """DataFrame form of ``dedup_paragraphs_in_doc`` + how many
    paragraphs were dropped (``n_paras_removed``)."""
    paras = F.split(F.col(text_col), _re.escape(sep))
    clean = dedup_paragraphs_in_doc(F.col(text_col), sep)
    return df.withColumn(out_col, clean).withColumn(
        "n_paras_removed",
        (F.size(paras) - F.size(F.split(F.col(out_col), _re.escape(sep)))).cast("int"),
    )
