"""Streaming corpus-drift monitor (event-time windowed category mix).

The streaming face of ``operators/drift.py``: as pages stream in, keep
an event-time-windowed histogram of a category column (language,
quality decile, drop_reason), and score each finalized window against a
fixed baseline distribution with the same Jensen-Shannon machinery the
batch dump-drift queries use.

Streaming constraints shape the split: Structured Streaming allows ONE
aggregation per query, so the stream side stops at the windowed
(window, category) counts — watermark-bounded state, append-mode
emission, the exact shape ``streaming_drop_reason_counts`` already
proved out.  The JS-vs-baseline comparison is a second aggregation over
the BOUNDED count rows, so it runs batch-side: in a ``foreachBatch``
sink, or over the sink table after the fact — both via
``operators/drift.py:drift_vs_baseline`` / ``js_vs_baseline`` with
``by_cols=["window_start", "window_end"]``.

Batch-equivalence contract (how this is tested without wall-clock
flakiness): running the windowed count over the same rows as a static
frame, then the same drift functions, must produce identical results —
see tests/test_streaming_monitor.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["category_window_counts", "streaming_category_counts"]


def category_window_counts(
    df: DataFrame,
    category_col: str,
    window_duration: str = "10 minutes",
    event_time_col: str = "warc_ts",
) -> DataFrame:
    """The shared (batch ∪ streaming) windowed histogram: one row per
    (window, category) with its count.  Null categories fold into '∅'
    (the drift-family convention).  This is the single aggregation —
    everything downstream operates on these bounded rows."""
    cat = F.coalesce(F.col(category_col).cast("string"), F.lit("∅"))
    return (
        df.groupBy(
            F.window(F.col(event_time_col), window_duration).alias("win"),
            cat.alias("category"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "category",
            "n",
        )
    )


def streaming_category_counts(
    stream: DataFrame,
    category_col: str,
    window_duration: str = "10 minutes",
    watermark_delay: str = "30 minutes",
    event_time_col: str = "warc_ts",
) -> DataFrame:
    """Streaming form: watermark first, then the same windowed
    histogram.  The watermark finalizes + evicts window state once
    event time passes, so state is O(windows-in-horizon × categories),
    append-mode output.  Feed the finalized rows to
    ``operators/drift.py:js_vs_baseline(counts, baseline,
    by_cols=["window_start", "window_end"])`` in a foreachBatch sink
    (or over the sink table) for the per-window alerting scalar."""
    return category_window_counts(
        stream.withWatermark(event_time_col, watermark_delay),
        category_col,
        window_duration,
        event_time_col,
    )
