"""spark-submit entry point for the quality-filter pipeline.

Cluster usage (north rule: packaged for --py-files, resumable):

    cd repo && zip -r fineweb_spark.zip fineweb_domain_analyzer_spark
    spark-submit --py-files fineweb_spark.zip \
        fineweb_domain_analyzer_spark/job.py \
        --pages <parquet-or-iceberg-path> \
        --policy <policy-parquet> \
        --output <out-path> \
        --manifest <checkpoint.json> \
        [--splits <comma-separated split keys>] \
        [--synth-rows N]   # synthesize deterministic input instead

The job is batch + idempotent: input is processed in named splits,
each committed via dynamic-partition overwrite and recorded in the
manifest (plans/checkpoint.py). Re-running after a crash reprocesses
at most the one uncommitted split.

Local smoke:
    python -m fineweb_domain_analyzer_spark.job --synth-rows 50000 \
        --output /tmp/fw_out --manifest /tmp/fw_manifest.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import functions as F

from fineweb_domain_analyzer_spark.operators.metrics import (
    drop_reason_histogram,
    filter_stats,
    partition_lineage,
)
from fineweb_domain_analyzer_spark.plans.checkpoint import Checkpointer, run_resumable
from fineweb_domain_analyzer_spark.plans.pipeline import (
    PipelineConfig,
    quality_filter_pipeline,
)

from fineweb_domain_analyzer_spark.sources.pages import (
    synth_pages,
    synth_policy_for_domains,
)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="fineweb quality-filter job")
    p.add_argument("--pages", help="input pages parquet/Iceberg path")
    p.add_argument("--policy", help="domain-policy parquet path")
    p.add_argument("--output", required=True)
    p.add_argument("--manifest", required=True, help="checkpoint manifest path")
    p.add_argument("--splits", default="all", help="comma-separated split keys")
    p.add_argument("--synth-rows", type=int, default=0, help="synthesize input")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from fineweb_domain_analyzer_spark.session import get_spark_owned

    spark, created = get_spark_owned(
        app_name="fineweb-quality-filter", master=args.master
    )
    t0 = time.time()

    def bucket_split(df, split):
        """split key = stable bucket of url → disjoint restartable units."""
        if split == "all":
            return df
        n = 16
        return df.filter(F.pmod(F.xxhash64("url"), F.lit(n)) == int(split))

    if args.synth_rows:
        policy = synth_policy_for_domains(spark, 2000)

        def load_split(spark_, split):
            return bucket_split(
                synth_pages(spark_, args.synth_rows, n_domains=2000, seed=42), split
            )

    else:
        policy = spark.read.parquet(args.policy)

        def load_split(spark_, split):
            return bucket_split(spark_.read.parquet(args.pages), split)

    def process(spark_, split):
        pages = load_split(spark_, split)
        return quality_filter_pipeline(pages, policy, PipelineConfig())

    cp = Checkpointer(args.manifest)
    splits = args.splits.split(",")
    done = run_resumable(spark, splits, process, args.output, cp)

    labeled = spark.read.parquet(args.output)
    # read-back metrics keep the job's success signal honest: they
    # measure what was actually committed, not what was planned
    labeled = labeled.withColumn("keep", F.col("drop_reason") == "kept")
    stats = filter_stats(labeled).collect()[0]
    hist = {
        r["drop_reason"]: r["cnt"] for r in drop_reason_histogram(labeled).collect()
    }
    lineage_rows = partition_lineage(labeled).count()
    sec = time.time() - t0
    print(
        json.dumps(
            {
                "splits_processed": done,
                "total": stats["total_processed"],
                "kept": stats["filtered_kept"],
                "excluded": stats["excluded_count"],
                "keep_ratio": stats["keep_ratio"],
                "drop_reason_histogram": hist,
                "lineage_partitions": lineage_rows,
                "wall_sec": round(sec, 2),
                "docs_per_sec": round(stats["total_processed"] / sec, 1),
            }
        )
    )
    if created:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
