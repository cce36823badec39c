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

import pandas as pd  # module-level so the UDF's stringified type hints resolve
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


# --- DOM-aware variant (stdlib html.parser, Arrow pandas UDF) ----------------

_BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li tr table ul ol blockquote pre section "
    "article header footer nav aside br hr".split()
)
_SKIP_TAGS = frozenset({"script", "style"})


def dom_extract_text(html: str) -> str:
    """DOM-aware visible-text extraction via the stdlib tokenizer
    (``html.parser.HTMLParser``) — the variant that survives
    adversarial markup the regex chain mis-handles: ``>`` inside
    attribute values, ``<`` inside script strings, CDATA blocks,
    comments containing tags, unclosed tags at EOF. Entities
    (named + numeric) decode via the parser's charref conversion.

    Same whitespace normalization as ``html_to_text`` so the two
    variants are comparable on well-formed markup. Pure Python —
    unit-testable without a session; the Spark crossing is
    ``dom_html_to_text_udf`` (Arrow-batched)."""
    import re
    from html.parser import HTMLParser

    class _Extractor(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.parts: list[str] = []
            self._skip_depth = 0
            self._closing = False

        def close(self):
            # close() flushes whatever the tokenizer still buffers.
            # Two distinct cases: an unterminated tag-shaped construct
            # ('<div class="x' at EOF) is markup garbage, but with
            # convert_charrefs=True the tokenizer ALSO holds back plain
            # trailing text whose tail contains an unresolved '&' (e.g.
            # 'Call AT&T') — that is visible text and must be kept.
            # rawdata tells them apart: markup leftovers start with '<'.
            self._closing = self.rawdata.startswith("<")
            super().close()

        def handle_starttag(self, tag, attrs):
            if tag in _SKIP_TAGS:
                self._skip_depth += 1
            elif tag in _BLOCK_TAGS:
                self.parts.append("\n")

        def handle_endtag(self, tag):
            if tag in _SKIP_TAGS:
                self._skip_depth = max(0, self._skip_depth - 1)
            elif tag in _BLOCK_TAGS:
                self.parts.append("\n")

        def handle_startendtag(self, tag, attrs):
            if tag in _BLOCK_TAGS:
                self.parts.append("\n")

        def handle_data(self, data):
            # _closing is set only when close() is flushing an
            # incomplete trailing construct (piecewise: '<', then the
            # rest) — markup garbage, never visible text
            if self._skip_depth or self._closing:
                return
            self.parts.append(data)

        # comments / doctype / CDATA-as-unknown-decl: dropped
        def handle_comment(self, data):
            pass

        def unknown_decl(self, data):
            pass

    p = _Extractor()
    p.feed(html)
    p.close()
    out = "".join(p.parts)
    out = re.sub(r"[ \t]+", " ", out)
    out = re.sub(r" ?\n ?", "\n", out)
    out = re.sub(r"\n{2,}", "\n", out)
    return out.strip(" \t\n\r")


def dom_html_to_text_udf():
    """Arrow-batched pandas UDF over ``dom_extract_text`` (factory —
    module-level UDF creation would need a DataType before any session
    exists). Python per row, but the parse is stdlib-C-tokenizer-bound
    and amortized over Arrow batches — the standard trade: the regex
    chain (``html_to_text``) is the JVM/codegen fast path good enough
    for quality heuristics, this is the fidelity path for corpus
    text."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def dom_extract(html: pd.Series) -> pd.Series:
        return html.map(
            lambda s: None if s is None else dom_extract_text(s)
        )

    return dom_extract


def with_extracted_text(
    df: DataFrame,
    html_col: str = "html_text",
    out_col: str = "extracted_text",
    mode: str = "regex",
) -> DataFrame:
    """html (STRING — decode binary first via decode_utf8_ignore_udf)
    → visible text.

    ``mode="regex"`` (default): the codegen regexp chain — one fused
    JVM projection, free rider on the scan; right for heuristics.
    ``mode="dom"``: the stdlib-parser pandas UDF — handles markup the
    regex chain cannot (see ``dom_extract_text``); right when the
    extracted text IS the product."""
    if mode == "regex":
        return df.withColumn(out_col, html_to_text(F.col(html_col)))
    if mode == "dom":
        return df.withColumn(out_col, dom_html_to_text_udf()(F.col(html_col)))
    raise ValueError(f"mode must be 'regex' or 'dom', got {mode!r}")


def extract_hrefs(html: Column) -> Column:
    """All double-quoted ``href`` attribute values, in document order —
    the crawl-time outlink-extraction step, as ONE
    ``regexp_extract_all`` inside whole-stage codegen (no UDF, no
    shuffle). Scope: double-quoted attributes (the overwhelmingly
    dominant form in served HTML); single-quoted/bare attributes are
    the DOM parser path's job (``dom_extract_text``'s HTMLParser can
    surface attrs when needed)."""
    return F.regexp_extract_all(html, F.lit(r'href="([^"]*)"'), 1)


def extract_anchors(html: Column) -> Column:
    """``array<struct<href,text>>`` of simple double-quoted anchors —
    the (link, anchor-text) pairs behind link-text quality signals and
    anchor-based relevance labels. One full-match ``regexp_extract_all``
    + per-element group extraction, all inside codegen.

    Scope: anchors whose inner text contains no nested markup
    (``[^<]*``) — the dominant form; nested-markup anchors are skipped
    IDENTICALLY by the Spark and DuckDB oracles (same regex class), so
    the contract is engine-consistent by construction."""
    tags = F.regexp_extract_all(
        html, F.lit(r'<a\s[^>]*href="[^"]*"[^>]*>[^<]*</a>'), 0
    )
    return F.transform(
        tags,
        lambda t: F.struct(
            F.regexp_extract(t, r'href="([^"]*)"', 1).alias("href"),
            F.regexp_extract(t, r">([^<]*)</a>", 1).alias("text"),
        ),
    )


def extract_title(html: Column) -> Column:
    """``<title>`` text (first occurrence, no nested markup) — one
    group-extracting regex inside codegen; '' when absent (regexp
    no-match contract, identical in DuckDB)."""
    return F.regexp_extract(html, r"(?i)<title[^>]*>([^<]*)</title>", 1)


def extract_meta_description(html: Column) -> Column:
    """``<meta name="description" content="...">`` value — the
    name-before-content attribute order (the dominant served form;
    attribute-order-insensitive parsing is the DOM path's job)."""
    return F.regexp_extract(
        html,
        r'(?i)<meta\s[^>]*name="description"[^>]*content="([^"]*)"',
        1,
    )
