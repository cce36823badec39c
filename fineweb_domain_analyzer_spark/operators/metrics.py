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
