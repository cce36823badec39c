"""Per-domain aggregation — the reference's stage 2 (A1/A2/O1 of SURVEY §2.5).

Reference (/root/reference/fineweb_analyzer.py:115-244) streams rows
into a ``defaultdict(domain → {count, urls≤5, tld, first_seen,
last_seen})``. Spark shape: one hash aggregation with map-side partial
combine. Two divergences, both deliberate and documented:

* the reference's ``urls`` (first 5 in input order) and first/last_seen
  (input order) are nondeterministic under distribution; we order
  explicitly by (order_col) so results are stable (SURVEY §2.2 caveat);
* the reference falls back to ``datetime.now()`` when a row lacks a
  timestamp (P6); we take an injected ``run_ts`` literal instead so
  runs are reproducible.

Scale note: ``groupBy(domain)`` is the engine's one unavoidable
shuffle. Both variants bound per-key memory with a ``row_number ≤ 5``
window before any collect (the per-domain sort spills via Tungsten's
external sorter; aggregation buffers hold ≤ 5 rows). Head domains are
Zipf-heavy at CC scale, so the skew-safe variant
(``domain_stats_salted``) additionally defuses single-task wall-clock
skew with a two-phase salted aggregation: partial per (domain, salt),
final per domain. count/min/max compose exactly; the top-5 url list
composes because each partial keeps its 5 smallest (order_col)
candidates — the global top-5 is a subset of the union of per-salt
top-5s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fineweb_domain_analyzer_spark.functions.domains import extract_tld_sql


def domain_stats(
    pages: DataFrame,
    domain_col: str = "domain",
    url_col: str = "url",
    order_col: str | None = None,
    ts_col: str | None = None,
    run_ts: str | None = None,
) -> DataFrame:
    """pages(domain, url, [ts]) → (domain, count, urls, tld, first_seen,
    last_seen). Rows with null/empty domain are excluded, mirroring the
    reference's ``if url:`` / ``if domain:`` guards (lines 172-174).

    Bounded state by construction: the deterministic smallest-5 urls
    come from a ``row_number ≤ 5`` window filter, so Tungsten's
    external sorter (spillable) does the per-domain ordering and every
    aggregation buffer afterwards holds at most 5 rows per domain — a
    Zipf head domain costs disk, never an OOM. count/first/last ride
    the same window partitioning, and the follow-up groupBy reuses the
    window's hash exchange, so the whole operator is still ONE shuffle.
    For 45%+ hot keys where even the spill-sort wall-time matters, use
    ``domain_stats_salted``.

    The struct's order field gets its own alias — with the default
    order_col == url_col a bare struct would carry two `url` fields and
    the s["url"] projection becomes an ambiguous reference.
    """
    from pyspark.sql.window import Window

    df = pages.filter(
        F.col(domain_col).isNotNull() & (F.col(domain_col) != "")
    )
    order_col = order_col or url_col
    if ts_col is None:
        ts_expr = F.lit(run_ts) if run_ts else F.lit(None).cast("string")
    else:
        # falsy check, not just null: the reference does
        # `record.get('timestamp') or now()` (fineweb_analyzer.py), so an
        # empty-string timestamp must also fall back to run_ts
        s = F.col(ts_col).cast("string")
        ts_expr = F.coalesce(F.when(s != "", s), F.lit(run_ts))
    df = df.withColumn("_seen_ts", ts_expr)
    w_ord = Window.partitionBy(domain_col).orderBy(
        F.col(order_col), F.col(url_col)
    )
    w_all = Window.partitionBy(domain_col)
    ranked = (
        df.withColumn("_rn", F.row_number().over(w_ord))
        .withColumn("_cnt", F.count(F.lit(1)).over(w_all))
        .withColumn("_first", F.min("_seen_ts").over(w_all))
        .withColumn("_last", F.max("_seen_ts").over(w_all))
        .filter(F.col("_rn") <= 5)
    )
    agg = ranked.groupBy(F.col(domain_col).alias("domain")).agg(
        F.first("_cnt").alias("count"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(order_col).alias("ord"), F.col(url_col).alias("url")
                    )
                )
            ),
            lambda s: s["url"],
        ).alias("urls"),
        F.first("_first").alias("first_seen"),
        F.first("_last").alias("last_seen"),
    )
    return agg.withColumn("tld", extract_tld_sql(F.col("domain"))).select(
        "domain", "count", "urls", "tld", "first_seen", "last_seen"
    )


def domain_stats_salted(
    pages: DataFrame,
    n_salts: int = 16,
    domain_col: str = "domain",
    url_col: str = "url",
    order_col: str | None = None,
    ts_col: str | None = None,
    run_ts: str | None = None,
) -> DataFrame:
    """Skew-defused two-phase variant. Phase 1 ranks per (domain, salt)
    — head domains fan out over n_salts sort partitions — and phase 2
    merges the tiny per-salt partials. Results are identical to
    ``domain_stats`` (verified by tests on Zipf data).

    Bounded state by construction: the top-5 comes from a window
    ``row_number`` over (domain, salt) — Tungsten's external sorter
    spills to disk, unlike a collect_list aggregation buffer which must
    hold every url of the hottest key in memory — and every collect
    after the rn ≤ 5 filter carries at most 5 rows per salt."""
    from pyspark.sql.window import Window

    order_col = order_col or url_col
    df = pages.filter(
        F.col(domain_col).isNotNull() & (F.col(domain_col) != "")
    )
    if ts_col is None:
        ts_expr = F.lit(run_ts) if run_ts else F.lit(None).cast("string")
    else:
        # falsy check, not just null: the reference does
        # `record.get('timestamp') or now()` (fineweb_analyzer.py), so an
        # empty-string timestamp must also fall back to run_ts
        s = F.col(ts_col).cast("string")
        ts_expr = F.coalesce(F.when(s != "", s), F.lit(run_ts))
    df = df.withColumn("_seen_ts", ts_expr).withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_salts))
    )
    w_ord = Window.partitionBy(domain_col, "_salt").orderBy(
        F.col(order_col), F.col(url_col)
    )
    w_all = Window.partitionBy(domain_col, "_salt")
    ranked = (
        df.withColumn("_rn", F.row_number().over(w_ord))
        .withColumn("_pcnt", F.count(F.lit(1)).over(w_all))
        .withColumn("_pfirst", F.min("_seen_ts").over(w_all))
        .withColumn("_plast", F.max("_seen_ts").over(w_all))
        .filter(F.col("_rn") <= 5)
    )
    # already hash-partitioned by (domain, salt) from the window — this
    # groupBy adds no exchange; collects are capped at 5 rows per group
    partial = ranked.groupBy(F.col(domain_col).alias("domain"), F.col("_salt")).agg(
        F.first("_pcnt").alias("_cnt"),
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(order_col).alias("ord"), F.col(url_col).alias("url"))
                )
            ),
            1,
            5,
        ).alias("_cand"),
        F.first("_pfirst").alias("_first"),
        F.first("_plast").alias("_last"),
    )
    final = partial.groupBy("domain").agg(
        F.sum("_cnt").alias("count"),
        F.slice(
            F.transform(
                F.array_sort(F.flatten(F.collect_list("_cand"))), lambda s: s["url"]
            ),
            1,
            5,
        ).alias("urls"),
        F.min("_first").alias("first_seen"),
        F.max("_last").alias("last_seen"),
    )
    return final.withColumn("tld", extract_tld_sql(F.col("domain"))).select(
        "domain", "count", "urls", "tld", "first_seen", "last_seen"
    )


def distinct_domains(pages: DataFrame, domain_col: str = "domain") -> DataFrame:
    """Stage-3 input: the grouping keys (fineweb_analyzer.py:594)."""
    return (
        pages.filter(F.col(domain_col).isNotNull() & (F.col(domain_col) != ""))
        .select(F.col(domain_col).alias("domain"))
        .distinct()
    )


def domain_signature_terms(
    docs: DataFrame,
    domain_col: str = "source",
    tokens_col: str = "_tk",
    k: int = 10,
) -> DataFrame:
    """Per-domain SIGNATURE TERMS — tf-idf-style heavy hitters that
    characterize each site against the rest of the corpus (corpus
    exploration / topic-mix audits; the per-domain complement of the
    corpus-wide q34 vocabulary top-k).

    Each domain is one pseudo-document: ``tf`` counts the token's
    occurrences inside the domain, ``df`` counts the domains containing
    it, and the idf-ish score is the EXACT integer
    ``score_e4 = tf * 10000 // df`` — rare-elsewhere tokens rank above
    stopwords without a float log whose last ulp differs between
    engines (same determinism rule as the drift/mixture operators).
    Ties break on (tf desc, token asc) for a total order.

    Scale shape: explode → (domain, token) partial-count shuffle (key
    is content-salted by the token, so a Zipf head domain spreads);
    ``df`` is a second agg over the ALREADY-GROUPED (domain, token)
    frame — one row per pair, never the raw occurrences; the df join
    keys on the token (near-uniform); the final top-k is a row_number
    window per domain over its DISTINCT tokens, vocabulary-bounded
    (same per-group trade as the reference's top-5 URL list, A1).
    """
    from pyspark.sql.window import Window

    pairs = (
        docs.select(
            F.col(domain_col).alias("domain"),
            F.explode(F.col(tokens_col)).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("domain", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_counts = pairs.groupBy("token").agg(
        F.count(F.lit(1)).alias("df")
    )
    # integral `div`, not floor(double): tf*10000 stays bigint end to
    # end, so the score is exact at any magnitude
    scored = pairs.join(df_counts, "token").withColumn(
        "score_e4", F.expr("(tf * 10000) div df").cast("bigint")
    )
    w = Window.partitionBy("domain").orderBy(
        F.col("score_e4").desc(), F.col("tf").desc(), F.col("token")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("domain", "token", "tf", "df", "score_e4", "rnk")
    )
