"""Bucketed storage — shuffle-free repeated joins/aggregations.

At 100 TB, any table that is repeatedly joined or aggregated on one key
(pages by domain, embeddings by cluster_id, policy by domain) should be
WRITTEN bucketed on that key: ``bucketBy(n, key)`` hash-partitions rows
into a fixed number of files per partition, and Catalyst then treats a
scan of the table as already hash-distributed — groupBy(key) and
equi-joins between two tables bucketed the same way run with ZERO
exchange operators (verified by tests/test_bucketing.py on the physical
plan). This converts the engine's per-job shuffles into a one-time
write-side cost that every downstream job shares.

Caveats that matter at scale (all standard Spark semantics):

* bucket counts must MATCH between join sides (or be multiples with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
* bucketed tables need a catalog (``saveAsTable``) — plain
  ``.parquet(path)`` writes lose bucket metadata;
* one file per (partition × bucket): pick n_buckets so files land in
  the 128 MB – 1 GB range, and pre-repartition by the bucket key before
  writing to avoid small-file explosion (each write task otherwise
  emits a file per bucket it sees).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Write df as a bucketed (optionally sorted) catalog table.

    Pre-repartitions by the bucket column so each write task emits one
    file per bucket it owns instead of one per bucket it merely sees.
    Sorting within buckets additionally enables sort-merge joins with
    no sort step. ``path`` makes it an external table there instead of
    under the (static) warehouse dir — bucket metadata is kept either
    way.
    """
    w = df.repartition(n_buckets, F.col(bucket_col)).write.mode(mode).bucketBy(
        n_buckets, bucket_col
    )
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed table — the result reports hash distribution on
    the bucket column to Catalyst, so downstream groupBy/joins on that
    column plan without an Exchange."""
    return spark.table(table)


def n_exchanges(df: DataFrame) -> int:
    """Count SHUFFLE Exchange operators in the physical plan (the metric
    bucketing exists to drive to zero). Counts every ``Exchange``
    variant — hash, range, AND SinglePartition (global aggregates) —
    while deliberately excluding BroadcastExchange (no fact-side
    shuffle) and ReusedExchange (no new work). Under AQE the initial
    plan is inspected; assertions that must pin a non-broadcast shape
    should disable AQE around the check (see tests)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = 0
    for line in plan.splitlines():
        if "BroadcastExchange" in line or "ReusedExchange" in line:
            continue
        if "Exchange" in line:
            n += 1
    return n
