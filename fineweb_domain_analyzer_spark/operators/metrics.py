"""Run + lineage metrics — the reference's filter stats (A3), generalized.

Reference (/root/reference/fineweb_analyzer.py:480-485) emits one global
``{total_processed, filtered_kept, excluded_count, keep_ratio}``. The
north rule requires per-partition lineage (rows in/out) plus a
drop-reason histogram; both are single partial-aggregating shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_stats(labeled: DataFrame) -> DataFrame:
    """Global stats — exactly the reference's four fields.

    keep_ratio is ``round(kept/total*100, 2)`` (fineweb_analyzer.py:484).
    """
    return labeled.agg(
        F.count(F.lit(1)).alias("total_processed"),
        F.coalesce(F.sum(F.col("keep").cast("long")), F.lit(0)).alias("filtered_kept"),
        F.coalesce(F.sum((~F.col("keep")).cast("long")), F.lit(0)).alias(
            "excluded_count"
        ),
    ).select(
        "total_processed",
        "filtered_kept",
        "excluded_count",
        # reference line 484: ratio is 0 (not null/NaN) on empty input
        F.when(F.col("total_processed") == 0, F.lit(0.0))
        .otherwise(
            F.round(F.col("filtered_kept") / F.col("total_processed") * 100, 2)
        )
        .alias("keep_ratio"),
    )


def partition_lineage(labeled: DataFrame) -> DataFrame:
    """Per-input-partition rows in/out — north-rule lineage. Map-side
    partial agg keyed by spark_partition_id(): one row per task."""
    return (
        labeled.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count(F.lit(1)).alias("total_processed"),
            F.sum(F.col("keep").cast("long")).alias("filtered_kept"),
            F.sum((~F.col("keep")).cast("long")).alias("excluded_count"),
        )
        .withColumn(
            "keep_ratio",
            F.round(F.col("filtered_kept") / F.col("total_processed") * 100, 2),
        )
    )


def drop_reason_histogram(labeled: DataFrame) -> DataFrame:
    """Histogram over the unified drop_reason enum (robots/quality/lang)."""
    return labeled.groupBy("drop_reason").agg(F.count(F.lit(1)).alias("cnt"))


def curation_funnel(
    labeled: DataFrame,
    rates: dict[str, int],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    default_rate: int = 0,
) -> DataFrame:
    """Per-stage lineage for the standard curation cascade

        ingest → robots filter → exact dedup → stratified sample

    computed in ONE pass over the corpus: every doc is tagged with the
    furthest stage it survives, then a single partial-aggregating
    reduction + ``stack()`` unpivots into the 4-row funnel
    ``(stage_idx, stage, rows_out, dropped)``.

    The trick that keeps this one job instead of four: the exact-dedup
    canonical flag comes from a window over ``(md5(text), keep)`` —
    including ``keep`` in the partition key gives kept docs their own
    keep-first numbering without materializing a kept-only subplan, so
    dropped docs ride along to be counted rather than being re-scanned.
    Cost at any scale: one shuffle (the dedup window, keyed by content
    hash so it's skew-free by construction) + one map-side-combined agg
    to a 1-row frame. ``labeled`` must carry ``keep`` (from
    :func:`~fineweb_domain_analyzer_spark.operators.filtering.label_pages`).

    Sampling semantics are identical to ``stratified_hash_sample``
    (md5-of-id percent buckets, integer-percent ``rates`` per stratum).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col(text_col)), F.col("keep")).orderBy(id_col)
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        % 100
    )
    rate = F.lit(default_rate)
    for stratum, pct in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(pct)).otherwise(rate)
    tagged = labeled.select(
        F.col("keep"),
        (F.col("keep") & (F.row_number().over(w) == 1)).alias("is_canon"),
        (bucket < rate).alias("sampled"),
    ).select(
        F.when(~F.col("keep"), F.lit(1))
        .when(~F.col("is_canon"), F.lit(2))
        .when(~F.col("sampled"), F.lit(3))
        .otherwise(F.lit(4))
        .alias("stage")
    )
    agg = tagged.agg(
        F.count(F.lit(1)).alias("n1"),
        F.coalesce(F.sum((F.col("stage") >= 2).cast("long")), F.lit(0)).alias("n2"),
        F.coalesce(F.sum((F.col("stage") >= 3).cast("long")), F.lit(0)).alias("n3"),
        F.coalesce(F.sum((F.col("stage") >= 4).cast("long")), F.lit(0)).alias("n4"),
    )
    return agg.selectExpr(
        """stack(4,
             1L, 'ingest',            n1, 0L,
             2L, 'robots_filter',     n2, n1 - n2,
             3L, 'exact_dedup',       n3, n2 - n3,
             4L, 'stratified_sample', n4, n3 - n4
           ) AS (stage_idx, stage, rows_out, dropped)"""
    )
