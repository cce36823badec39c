#!/usr/bin/env python
"""Skew-handling evidence: plain vs salted two-phase domain aggregation
on a hard-skewed corpus (one domain carrying ~45% of rows). The plain
plan funnels every hot-key row through one reducer for the collect_list
(top-5 urls) — partial aggregation cannot combine it map-side — while
the salted plan fans the hot key over n_salts reducers and merges tiny
partials. Writes BENCH/skew_bench.json with wall times and the hot-key
share; asserts both plans return identical results first.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ROWS = int(os.environ.get("SKEW_BENCH_ROWS", "2000000"))


def main() -> None:
    from pyspark.sql import functions as F

    from fineweb_domain_analyzer_spark.operators.domain_stats import (
        domain_stats,
        domain_stats_salted,
    )
    from fineweb_domain_analyzer_spark.session import get_spark
    from fineweb_domain_analyzer_spark.sources.pages import synth_pages

    spark = get_spark(
        master="local[32]",
        extra_confs={
            "spark.sql.shuffle.partitions": "64",
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            # isolate the two-phase effect from AQE's own skew splitting
            "spark.sql.adaptive.enabled": "false",
        },
    )
    from fineweb_domain_analyzer_spark.functions.domains import with_domain_sql

    base = with_domain_sql(synth_pages(spark, ROWS, n_domains=500, seed=7))
    # sharpen the head: fold ~45% of rows onto one domain
    pages = base.withColumn(
        "domain",
        F.when(F.pmod(F.xxhash64("url"), F.lit(100)) < 45, F.lit("hot.example.com"))
        .otherwise(F.col("domain")),
    ).select("domain", "url").write.mode("overwrite").parquet("/tmp/fw_skew_pages")
    pages = spark.read.parquet("/tmp/fw_skew_pages")
    hot_share = pages.filter(F.col("domain") == "hot.example.com").count() / ROWS

    # equivalence check on a sample: a DETERMINISTIC predicate, not
    # limit() — LIMIT without ordering may pick different rows per
    # execution, making the compare spuriously flaky
    sample = pages.filter(F.pmod(F.xxhash64("url"), F.lit(20)) == 0)
    a = {r["domain"]: (r["count"], tuple(r["urls"])) for r in domain_stats(sample).collect()}
    b = {r["domain"]: (r["count"], tuple(r["urls"])) for r in domain_stats_salted(sample).collect()}
    assert a == b, "salted aggregation diverged from plain"

    def timed(fn, n=2):
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            fn(pages).write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    plain = timed(domain_stats)
    salted = timed(domain_stats_salted)
    result = {
        "rows": ROWS,
        "hot_key_share": round(hot_share, 3),
        "plain_sec": plain,
        "salted_sec": salted,
        "speedup": round(plain / salted, 2),
        "note": (
            "both paths use the bounded row_number<=5 window (no "
            "unbounded collect buffers); AQE disabled to isolate the "
            "two-phase salting effect. The remaining speedup is pure "
            "wall-clock: salting fans the hot domain's spill-sort over "
            "n_salts tasks instead of one hot reducer, which on a "
            "1000-executor cluster is the whole job's critical path."
        ),
    }
    (REPO / "BENCH" / "skew_bench.json").write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
