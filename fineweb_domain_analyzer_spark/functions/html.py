"""Crude HTML → visible-text extraction as a JVM regexp chain.

The reference consumes pre-extracted text (its JSONL already carries a
`text` field); a from-crawl pipeline needs the extraction step itself.
Production systems use a DOM-aware extractor (trafilatura/jusText —
python libs, absent in this sandbox and deliberately NOT stubbed into
the hot path); this module is the **scale-shaped fallback**: script /
style / comment removal, block-tag newlines, tag strip, the five
ubiquitous entities, whitespace collapse — five `regexp_replace` and a
`replace` chain, all whole-stage codegen, zero Python. Good enough for
quality HEURISTICS (the downstream consumers here), not for
byte-faithful corpus text.

Regex portability: patterns use inline `(?is)` flags and lazy
quantifiers only — the Java-regex ∩ RE2 subset, so the DuckDB oracle
(queries.py q60) runs the identical patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered (pattern, replacement) regex stages
_STAGES = (
    # script/style blocks vanish entirely (their text is never visible)
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    # block-level closers become newlines so words don't fuse across
    # paragraphs when the tags are stripped
    (r"(?i)<(?:br\s*/?|/p|/div|/h[1-6]|/li|/tr)>", "\n"),
    (r"(?s)<[^>]*>", " "),
)

_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # LAST so freshly-decoded &amp;lt; stays literal
)


def html_to_text(html: Column) -> Column:
    out = html
    for pat, rep in _STAGES:
        out = F.regexp_replace(out, pat, rep)
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    # collapse horizontal runs, then blank-line runs, then trim
    out = F.regexp_replace(out, r"[ \t]+", " ")
    out = F.regexp_replace(out, r" ?\n ?", "\n")
    out = F.regexp_replace(out, r"\n{2,}", "\n")
    # trim() strips spaces only; edge newlines need the explicit set
    return F.btrim(out, F.lit(" \t\n\r"))


def with_extracted_text(
    df: DataFrame, html_col: str = "html_text", out_col: str = "extracted_text"
) -> DataFrame:
    """html (STRING — decode binary first via decode_utf8_ignore_udf)
    → visible text. One fused projection; free rider on the scan."""
    return df.withColumn(out_col, html_to_text(F.col(html_col)))
