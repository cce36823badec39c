"""Dump-over-dump distribution drift (corpus monitoring).

FineWeb-style pipelines process the web one crawl dump at a time; the
operational question between dumps is "did the corpus change under me?"
— a language-mix or quality-mix shift upstream silently changes what
the downstream filters keep.  This module computes the standard
monitoring statistic: per-category share deltas and the (binary)
Jensen-Shannon divergence between two dumps' category distributions.

Reference anchor: the reference engine (fineweb_analyzer.py) is
single-dump and has no monitoring surface at all — this is an
extension in the SURVEY §2 "LLM-data-pipeline operators" tier, the
observability companion to the cross-dump incremental dedup
(operators/incremental_dedup.py).

Scale design (the 100-TB story)
-------------------------------
* ONE groupBy(category) shuffle over the corpus with map-side combine;
  everything after runs on ≤ |categories| rows (languages, score
  deciles — dozens, not documents).
* Dump totals come from an unpartitioned window over those already-
  aggregated category rows — bounded by category cardinality, never a
  second corpus scan, never a driver collect.

Determinism contract
--------------------
Counts are exact bigints; shares and JS terms are IEEE doubles derived
from those integers with a fixed association order mirrored in the SQL
oracle, so per-category rows are bit-identical across engines and
partitionings.  The scalar JS sum would be float summation (order-
dependent), so each category's term is quantized to an integer —
``round(term * 1e9)`` — and summed exactly (the module-local _qsum
pattern from operators/training.py); the residual risk is a 1-ulp
libm ``ln`` difference landing exactly on a 1e-9 rounding boundary,
the same accepted risk class as the q80 gradient quantization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "with_dump",
    "distribution_drift",
    "js_divergence",
    "drift_vs_baseline",
    "js_vs_baseline",
]


def with_dump(
    df: DataFrame, id_col: str = "doc_id", out_col: str = "dump"
) -> Column | DataFrame:
    """Deterministic binary dump assignment: the q49 md5-bucket recipe
    (first 6 hex chars of md5(id) → 0..99), dump 0 for buckets < 50,
    dump 1 otherwise.  Stands in for a real crawl-dump column when the
    input has none; a real deployment passes its dump id instead."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        % 100
    )
    return df.withColumn(out_col, F.when(bucket < 50, 0).otherwise(1))


def distribution_drift(
    df: DataFrame, category_col: str, dump_col: str = "dump"
) -> DataFrame:
    """Per-category drift between two dumps: counts ``n0``/``n1``,
    shares ``p0``/``p1`` (exact-integer divisions), and the category's
    Jensen-Shannon term ``0.5·p0·ln(p0/m) + 0.5·p1·ln(p1/m)`` with
    ``m = (p0+p1)/2`` (natural log; zero-share terms contribute 0, the
    standard 0·ln0 = 0 convention).  Null categories are folded into
    the literal category ``'∅'`` so the grouping key is never null
    (and the fold's grp string stays engine-portable).

    One category-keyed corpus shuffle with map-side combine; dump
    totals via a bounded window over the aggregated category rows (no
    second corpus scan).  Output is O(|categories|) rows.
    """
    cat = F.coalesce(F.col(category_col).cast("string"), F.lit("∅"))
    is0 = (F.col(dump_col) == 0).cast("bigint")
    cnt = df.select(cat.alias("category"), is0.alias("_is0")).groupBy(
        "category"
    ).agg(
        F.sum("_is0").alias("n0"),
        F.sum(F.lit(1) - F.col("_is0")).alias("n1"),
    )
    return _terms_from_counts(cnt, [])


def _terms_from_counts(cnt: DataFrame, by: list[str]) -> DataFrame:
    """Shared tail of the drift family: given already-aggregated
    (by…, category, n0, n1) rows, attach side totals and the JS term.

    Totals come from a window over the ALREADY-AGGREGATED category
    rows — a second aggregation over the input (or a re-derived totals
    frame) would rescan and re-shuffle the whole corpus, doubling the
    scan at scale.  The window is bounded by the category cardinality
    per group, never the corpus."""
    wall = Window.partitionBy(*by) if by else Window.partitionBy()
    j = cnt.withColumn("_t0", F.sum("n0").over(wall)).withColumn(
        "_t1", F.sum("n1").over(wall)
    )
    p0 = F.col("n0").cast("double") / F.col("_t0").cast("double")
    p1 = F.col("n1").cast("double") / F.col("_t1").cast("double")
    m = (F.col("p0") + F.col("p1")) / F.lit(2.0)
    half = F.lit(0.5)
    term = F.when(F.col("p0") > 0, half * F.col("p0") * F.log(F.col("p0") / F.col("_m"))).otherwise(
        F.lit(0.0)
    ) + F.when(F.col("p1") > 0, half * F.col("p1") * F.log(F.col("p1") / F.col("_m"))).otherwise(
        F.lit(0.0)
    )
    return (
        j.select(*by, "category", "n0", "n1", p0.alias("p0"), p1.alias("p1"))
        .withColumn("_m", m)
        .withColumn("js_term", term)
        .drop("_m")
    )


def js_divergence(
    df: DataFrame, category_col: str, dump_col: str = "dump"
) -> DataFrame:
    """Scalar Jensen-Shannon divergence between the two dumps' category
    distributions (one row: ``n0``, ``n1``, ``js``).  Per-category
    terms are quantized to 1e-9 and summed as exact integers so the
    scalar is partition-order-independent (see module docstring);
    0 ≤ js ≤ ln 2 ≈ 0.6931, js = 0 iff the mixes are identical."""
    drift = distribution_drift(df, category_col, dump_col)
    qterm = F.round(F.col("js_term") * 1e9, 0).cast("bigint")
    agg = drift.agg(
        F.sum("n0").alias("n0"),
        F.sum("n1").alias("n1"),
        F.sum(qterm).alias("_q"),
    )
    return agg.select(
        "n0", "n1", (F.col("_q").cast("double") / F.lit(1e9)).alias("js")
    )


def drift_vs_baseline(
    counts: DataFrame,
    baseline: DataFrame,
    category_col: str = "category",
    count_col: str = "n",
    baseline_count_col: str = "n",
    by_cols: list[str] | None = None,
) -> DataFrame:
    """Per-category drift of ALREADY-AGGREGATED counts against a fixed
    baseline distribution — the form the streaming monitor uses
    (``counts`` = one row per (window…, category) from
    ``streaming/monitor.py:streaming_category_counts``; ``baseline`` =
    the reference corpus' category counts) and the batch form for
    "new dump vs reference corpus".

    Output matches `distribution_drift` (baseline is side 0, the
    monitored counts side 1), one table per ``by_cols`` group.  Every
    baseline category appears in every group (share-0 monitored side),
    and monitored categories missing from the baseline get baseline
    share 0 — both via a grid + full-outer join over the BOUNDED count
    frames (the corpus-scale work already happened upstream in the
    aggregation that produced ``counts``)."""
    by = list(by_cols or [])
    cat_b = F.coalesce(F.col(category_col).cast("string"), F.lit("∅"))
    base = baseline.select(
        cat_b.alias("category"),
        F.col(baseline_count_col).cast("bigint").alias("n0"),
    ).groupBy("category").agg(F.sum("n0").alias("n0"))
    mon = counts.select(
        *by,
        cat_b.alias("category"),
        F.col(count_col).cast("bigint").alias("n1"),
    ).groupBy(*by, "category").agg(F.sum("n1").alias("n1"))
    if by:
        grid = mon.select(*by).distinct().crossJoin(F.broadcast(base))
    else:
        grid = base
    # the grid shares lineage (attribute ids) with mon, so a plain
    # column-name self-join is ambiguous — RENAME the grid's key
    # columns (projection aliases mint fresh attribute ids) and join on
    # explicit renamed-vs-original conditions
    keys = [*by, "category"]
    g = grid.select(
        *[F.col(c).alias(f"_g_{c}") for c in keys], F.col("n0")
    )
    cond = [F.col(f"_g_{c}").eqNullSafe(F.col(c)) for c in keys]
    cnt = g.join(mon, cond, "full").select(
        *[
            F.coalesce(F.col(f"_g_{c}"), F.col(c)).alias(c)
            for c in keys
        ],
        F.coalesce(F.col("n0"), F.lit(0)).alias("n0"),
        F.coalesce(F.col("n1"), F.lit(0)).alias("n1"),
    )
    return _terms_from_counts(cnt, by)


def js_vs_baseline(
    counts: DataFrame,
    baseline: DataFrame,
    category_col: str = "category",
    count_col: str = "n",
    baseline_count_col: str = "n",
    by_cols: list[str] | None = None,
) -> DataFrame:
    """Scalar Jensen-Shannon divergence vs the baseline, one row per
    ``by_cols`` group (e.g. per event-time window) — the alerting
    number for the streaming monitor.  Same 1e-9 term quantization +
    exact integer sum as `js_divergence`."""
    by = list(by_cols or [])
    terms = drift_vs_baseline(
        counts, baseline, category_col, count_col, baseline_count_col, by
    )
    qterm = F.round(F.col("js_term") * 1e9, 0).cast("bigint")
    agg = terms.groupBy(*by).agg(
        F.sum("n0").alias("n0"),
        F.sum("n1").alias("n1"),
        F.sum(qterm).alias("_q"),
    )
    return agg.select(
        *by, "n0", "n1", (F.col("_q").cast("double") / F.lit(1e9)).alias("js")
    )
