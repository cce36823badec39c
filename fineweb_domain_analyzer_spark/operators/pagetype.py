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
    scan_chars: int | None = None,
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
    # Cost structure (BENCH/gates_overhead.json): per-row cost is the
    # TOTAL regex alternatives scanned × text length — invariant to how
    # the scans are grouped (a union pre-filter measured no better than
    # per-rule scans on non-matching rows, which are ~all rows). What
    # does help: (1) stage lower(text) once as its own column; (2)
    # resolve the rule INDEX once and derive the type name from the
    # staged index with integer compares, so requesting idx_col never
    # doubles the regex work; (3) the union pre-filter still confines
    # the per-rule cascade to matching rows, so adding MORE rules only
    # grows the single combined scan for the content majority; (4) the
    # scan_chars knob below bounds cost independently of text length.
    scanned = F.col(text_col)
    if scan_chars is not None:
        # scale knob: boilerplate markers (error banners, parking pages,
        # login/cookie walls) sit at the TOP of a page; bounding the
        # scanned window caps the per-row regex cost independently of
        # document length. Off by default — classification of a marker
        # past the window differs from the full-text scan, so enabling
        # it is an explicit accuracy/cost trade.
        scanned = F.substring(scanned, 1, scan_chars)
    df = df.withColumn("_pt_lw", F.lower(scanned))
    lowered = F.col("_pt_lw")
    combined = "(" + "|".join(pat for _name, pat in rules) + ")"
    idx_expr = None
    for i, (_name, pat) in enumerate(rules):
        cond = lowered.rlike(pat)
        idx_expr = (
            F.when(cond, F.lit(i))
            if idx_expr is None
            else idx_expr.when(cond, F.lit(i))
        )
    idx_staged = F.when(
        lowered.rlike(combined), idx_expr.otherwise(F.lit(DEFAULT_IDX))
    ).otherwise(F.lit(DEFAULT_IDX))
    df = df.withColumn("_pt_idx", idx_staged.cast("long"))
    type_expr = None
    for i, (name, _pat) in enumerate(rules):
        cond = F.col("_pt_idx") == i
        type_expr = (
            F.when(cond, F.lit(name))
            if type_expr is None
            else type_expr.when(cond, F.lit(name))
        )
    out = df.withColumn(out_col, type_expr.otherwise(F.lit(default_type)))
    if idx_col is not None:
        out = out.withColumn(idx_col, F.col("_pt_idx"))
    return out.drop("_pt_lw", "_pt_idx")


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
