#!/usr/bin/env python
"""Measure the one-pass curation funnel (operators/metrics.py:
curation_funnel) against the naive alternative every pipeline starts
with — four separate jobs (count; filter+count; dedup+count;
sample+count), each re-scanning and re-deduping. Evidence for the
single-pass design claim in q50's docstring.

Writes BENCH/funnel_bench.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "3"))
# 0 -> bench the (small) sf corpus via pages_view; N -> synthesize an
# N-row Zipf pages corpus once and bench over its cached parquet
ROWS = int(os.environ.get("FW_FUNNEL_ROWS", "0"))


def _load(spark, sf_dir):
    from pyspark.sql import functions as F

    from fineweb_domain_analyzer_spark.queries import pages_view, policy_view
    from fineweb_domain_analyzer_spark.sources.pages import (
        synth_pages,
        synth_policy_for_domains,
    )

    if not ROWS:
        return pages_view(spark, sf_dir), policy_view(spark, sf_dir)
    from pathlib import Path as _P

    path = f"/tmp/fw_funnel_pages_{ROWS}"
    if not (_P(path) / "_SUCCESS").exists():
        synth_pages(spark, ROWS, n_domains=2000, seed=11).write.mode(
            "overwrite"
        ).parquet(path)
    pages = spark.read.parquet(path).select(
        F.regexp_extract("url", r"/p/([0-9]+)$", 1).cast("long").alias("doc_id"),
        "url",
        "text",
        "lang",
    )
    return pages, synth_policy_for_domains(spark, 2000)


def naive_funnel(spark, sf_dir):
    """Four independent actions, the way a notebook user writes it."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from fineweb_domain_analyzer_spark.operators.filtering import (
        label_pages,
        stratified_hash_sample,
    )

    pages, policy = _load(spark, sf_dir)
    labeled = label_pages(pages, policy, exact_domain=True)
    n1 = labeled.count()
    kept = labeled.filter(F.col("keep"))
    n2 = kept.count()
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    canon = kept.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    n3 = canon.count()
    n4 = stratified_hash_sample(
        canon, rates={"en": 50}, default_rate=25
    ).count()
    return (n1, n2, n3, n4)


def onepass_funnel(spark, sf_dir):
    from fineweb_domain_analyzer_spark.operators.filtering import label_pages
    from fineweb_domain_analyzer_spark.operators.metrics import curation_funnel

    pages, policy = _load(spark, sf_dir)
    labeled = label_pages(pages, policy, exact_domain=True)
    rows = (
        curation_funnel(labeled, rates={"en": 50}, default_rate=25)
        .orderBy("stage_idx")
        .collect()
    )
    return tuple(r["rows_out"] for r in rows)


def main() -> None:
    from fineweb_domain_analyzer_spark.session import get_spark

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_confs={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    # warm both paths once (JVM/codegen warmup), then median of REPS
    results = {}
    for name, fn in (("naive_4job", naive_funnel), ("onepass", onepass_funnel)):
        fn(spark, SF)
        samples, out = [], None
        for _ in range(REPS):
            t0 = time.monotonic()
            out = fn(spark, SF)
            samples.append(round(time.monotonic() - t0, 3))
        samples.sort()
        results[name] = {
            "funnel": list(out),
            "median_sec": samples[len(samples) // 2],
            "samples_sec": samples,
        }
    assert results["naive_4job"]["funnel"] == results["onepass"]["funnel"], results
    results["speedup"] = round(
        results["naive_4job"]["median_sec"] / results["onepass"]["median_sec"], 3
    )
    results["sf_dir"] = SF if not ROWS else f"synth:{ROWS}"
    out_path = REPO / "BENCH" / "funnel_bench.json"
    out_path.write_text(json.dumps(results, indent=1) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
