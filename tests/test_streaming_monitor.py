"""Streaming drift monitor: batch equivalence of the windowed category
histogram, and JS-vs-baseline over the finalized windows (hand-checked
grid semantics: baseline-only and window-only categories)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fineweb_domain_analyzer_spark.operators.drift import (
    drift_vs_baseline,
    js_vs_baseline,
)
from fineweb_domain_analyzer_spark.sources.pages import synth_pages
from fineweb_domain_analyzer_spark.streaming import read_pages_stream
from fineweb_domain_analyzer_spark.streaming.monitor import (
    category_window_counts,
    streaming_category_counts,
)

N = 400


def test_streaming_counts_match_batch(spark, tmp_path):
    in_dir = str(tmp_path / "landing")
    synth_pages(spark, N, n_domains=20, seed=7, partitions=1).write.parquet(
        in_dir
    )
    counts = streaming_category_counts(
        read_pages_stream(spark, in_dir),
        "lang",
        window_duration="1 hour",
        watermark_delay="0 seconds",
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("drift_sink")
        .trigger(availableNow=True)
        .outputMode("complete")
        .start()
    )
    q.awaitTermination()
    stream_rows = {
        (r["window_start"], r["category"]): r["n"]
        for r in spark.table("drift_sink").collect()
    }
    batch_rows = {
        (r["window_start"], r["category"]): r["n"]
        for r in category_window_counts(
            spark.read.parquet(in_dir), "lang", "1 hour"
        ).collect()
    }
    assert stream_rows == batch_rows
    assert sum(batch_rows.values()) == N

    # per-window JS vs a uniform baseline over the observed categories:
    # one scalar per finalized window, all finite and within [0, ln 2]
    cats = sorted({c for (_, c) in batch_rows})
    baseline = spark.createDataFrame(
        [(c, 10) for c in cats], "category string, n bigint"
    )
    js = js_vs_baseline(
        spark.table("drift_sink"),
        baseline,
        by_cols=["window_start", "window_end"],
    ).collect()
    assert len(js) == len({w for (w, _) in batch_rows})
    for r in js:
        assert 0 <= r["js"] <= math.log(2) and r["n0"] == 10 * len(cats)


def test_drift_vs_baseline_grid_semantics(spark):
    """Baseline categories absent from a window appear with n1=0 in
    EVERY window; window categories absent from the baseline get n0=0;
    a window matching the baseline mix exactly scores js=0."""
    baseline = spark.createDataFrame(
        [("a", 2), ("b", 2)], "category string, n bigint"
    )
    counts = spark.createDataFrame(
        [("w1", "a", 3), ("w1", "c", 1), ("w2", "a", 5), ("w2", "b", 5)],
        "win string, category string, n bigint",
    )
    d = {
        (r["win"], r["category"]): r
        for r in drift_vs_baseline(
            counts, baseline, by_cols=["win"]
        ).collect()
    }
    # every baseline category present in every window
    assert ("w1", "b") in d and d[("w1", "b")]["n1"] == 0
    # window-only category present with baseline share 0
    assert d[("w1", "c")]["n0"] == 0 and d[("w1", "c")]["p0"] == 0.0
    # w2 mix (5,5) == baseline mix (2,2) -> exact zero drift
    js = {r["win"]: r["js"] for r in
          js_vs_baseline(counts, baseline, by_cols=["win"]).collect()}
    assert js["w2"] == 0.0 and js["w1"] > 0.0
