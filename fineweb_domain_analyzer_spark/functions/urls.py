"""URL canonicalization — collapse crawl-variant URLs to one key.

A web corpus sees the same page under many spellings: scheme/host case,
default ports, fragments, tracking parameters, shuffled query order,
trailing slashes. Exact dedup on the raw url misses all of them;
canonicalizing first is the standard pre-pass (it is how Common-Crawl
style pipelines key their URL-level dedup, and it composes with the
content-level dedup family in operators/dedup.py).

The reference has no URL normalization (its domain extraction,
/root/reference/fineweb_analyzer.py:128-152, keeps the port and strips
only ``www.`` — that quirk lives in functions/domains.py, NOT here);
this is north-rule/pipeline surface, so the rules are chosen for
production sense and documented exactly:

1. scheme and authority (host[:port]) lowercase
2. fragment stripped
3. default port stripped (``:443`` for https, ``:80`` for http);
   non-default ports KEPT (parity with the reference's domain quirk)
4. query params: drop ``utm_``-prefixed trackers, sort the rest
   byte-lexicographically, drop the ``?`` when none survive
5. trailing ``/`` stripped from the path (so ``/a/`` ≡ ``/a`` and a
   bare authority ≡ authority + ``/``)

Everything is built-in string/array expressions — no UDF, fully inside
whole-stage codegen; at 100 TB this canonicalization is a free rider on
the scan. The DuckDB oracle (queries.py q45) mirrors each rule with
DuckDB's string/list functions — independent implementation, equal
values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^([^:/?#]+)://"
_AUTH_RE = r"^[^:/?#]+://([^/?#]*)"
_TAIL_RE = r"^[^:/?#]+://[^/?#]*([^#]*)"  # path+query, fragment excluded


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module rules; null-safe
    (null/unparseable → null, so bad rows don't silently collide on
    an empty canonical key)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    auth = F.when(scheme == "https", F.regexp_replace(auth, ":443$", "")).otherwise(
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", "")).otherwise(auth)
    )
    tail = F.regexp_extract(url, _TAIL_RE, 1)
    path = F.regexp_replace(F.regexp_extract(tail, r"^([^?]*)", 1), r"/$", "")
    query = F.regexp_extract(tail, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (F.length(p) > 0) & ~p.startswith("utm_"),
        )
    )
    qs = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.when(
        scheme != "", F.concat(scheme, F.lit("://"), auth, path, qs)
    )  # no scheme → null


def with_canonical_url(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    return df.withColumn(out_col, canonicalize_url(F.col(url_col)))


def canonical_url_dedup(
    df: DataFrame, url_col: str = "url", order_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Keep one row per canonical URL (first by ``order_cols``, then by
    the raw url for a total deterministic order). Same keep-first
    window shape as operators/dedup.py:exact_dedup_keep_first — one
    shuffle on the canonical key, state bounded at 1 row per group."""
    from pyspark.sql.window import Window

    df = with_canonical_url(df, url_col)
    w = Window.partitionBy("canonical_url").orderBy(
        *[F.col(c) for c in order_cols], F.col(url_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
