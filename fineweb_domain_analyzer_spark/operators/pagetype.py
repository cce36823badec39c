"""Page-type heuristics — soft-404 / login-wall / parked-domain /
cookie-wall / placeholder detection.

Production crawl curation drops these page classes before quality
scoring, because they sail straight through the quality gates: a
soft-404 returns HTTP 200 with a fluent "page not found" body, a
parked domain serves registrar boilerplate, and login/cookie walls
hide the real content behind perfectly grammatical chrome — Gopher
rules, stopword density and perplexity all score them as fine prose.
The reference engine has no equivalent (EXTENSION); the default
phrase rules follow the publicly documented soft-404 / parked-domain
heuristics (error-phrase and registrar-boilerplate matching).

Scale shape: ONE chained-``when`` projection of JVM regexes
(``rlike``) — whole-stage codegen, zero shuffles, zero UDFs, zero
Python crossings. Cost is a fixed number of regex scans per row and
is embarrassingly parallel at any corpus size. First-match-wins
precedence: a page that is both an error page and cookie-walled is
classed by the earlier (more specific) rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (type, lowercase-regex) — order IS the precedence. Patterns are plain
# alternations of literal phrases so Java regex (Spark rlike) and RE2
# (DuckDB regexp_matches) agree byte-for-byte.
DEFAULT_PAGE_TYPE_RULES: list[tuple[str, str]] = [
    (
        "error_page",
        r"(404 not found|page not found|error 404|"
        r"the page you (requested|are looking for)|"
        r"this page (does not|doesn't) exist|no longer available)",
    ),
    (
        "login_wall",
        r"(please (log|sign) in|login required|"
        r"(log|sign) in to (continue|view|see)|"
        r"create an account to continue|members only)",
    ),
    (
        "parked_domain",
        r"(domain (is |may be )?for sale|buy this domain|"
        r"this domain (has been|was) (registered|purchased)|"
        r"domain parking|parked free)",
    ),
    (
        "cookie_wall",
        r"(we use cookies|accept (all )?cookies|"
        r"consent to (the use of |our )?cookies|cookie settings)",
    ),
    (
        "placeholder",
        r"(lorem ipsum|under construction|coming soon|"
        r"default web site page|welcome to nginx)",
    ),
]

DEFAULT_TYPE = "content"
DEFAULT_IDX = -1  # rule_idx for unmatched (content) pages


def with_page_type(
    df: DataFrame,
    text_col: str = "text",
    rules: list[tuple[str, str]] | None = None,
    out_col: str = "page_type",
    idx_col: str | None = None,
    default_type: str = DEFAULT_TYPE,
) -> DataFrame:
    """Add a first-match-wins page-type column (and optionally the
    matched rule's index as ``idx_col``, ``-1`` for ``default_type``).

    Null text matches nothing (``rlike`` over null is null, so every
    ``when`` falls through) and classifies as ``default_type`` — the
    same permissive null semantics as the pipeline's quality gates.
    """
    rules = DEFAULT_PAGE_TYPE_RULES if rules is None else rules
    if not rules:
        raise ValueError("rules must not be empty")
    lowered = F.lower(F.col(text_col))
    type_expr = None
    idx_expr = None
    for i, (name, pat) in enumerate(rules):
        cond = lowered.rlike(pat)
        if type_expr is None:
            type_expr = F.when(cond, F.lit(name))
            idx_expr = F.when(cond, F.lit(i))
        else:
            type_expr = type_expr.when(cond, F.lit(name))
            idx_expr = idx_expr.when(cond, F.lit(i))
    out = df.withColumn(out_col, type_expr.otherwise(F.lit(default_type)))
    if idx_col is not None:
        out = out.withColumn(
            idx_col, idx_expr.otherwise(F.lit(DEFAULT_IDX)).cast("long")
        )
    return out


def page_type_histogram(
    df: DataFrame,
    text_col: str = "text",
    rules: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Corpus-level page-type mix ``(page_type, cnt)`` — one map-side
    combined aggregation over the classification projection."""
    return (
        with_page_type(df, text_col=text_col, rules=rules)
        .groupBy("page_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
