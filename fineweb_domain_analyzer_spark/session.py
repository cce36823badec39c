"""SparkSession factory with scale-oriented defaults.

All knobs here are chosen for the 100 TB / 1000-executor target and
merely *scaled down* for local testing:

* AQE on (runtime coalescing, skew-join splitting) — the cluster-side
  answer to head-domain skew that `operators.skew` complements.
* Arrow on, with a bounded batch size so pandas-UDF model scoring
  (langid/perplexity) amortizes per-batch init without ballooning
  executor memory.
* shuffle partitions default to 2× cores locally; on a real cluster the
  submitter sets this to ~2-3× total executor cores (or relies on AQE
  coalescing from a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Broadcast threshold: the domain-policy dimension is O(domains) —
    # small relative to pages — so give Catalyst room to broadcast it.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    # Parquet scans: 128 MiB splits keep task count sane at 100 TB.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # zstd over snappy: measured 9% FASTER end-to-end writes AND 37%
    # smaller files on the pipeline output (interleaved A/B, 1.2M docs)
    # — at 100 TB that is both the cheaper storage and the faster job.
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.sql.shuffle.partitions": "32",
    # (driver memory is set below — derived from host RAM, env-overridable)
}


def _default_driver_mem() -> str:
    """Local mode runs ALL task threads in the driver JVM, so this conf
    is the whole cluster's heap: 32 threads × token-array-heavy stages
    OOM'd at 8g on a 9.6M-doc input, while a fixed large Xmx on a small
    host risks the kernel OOM-killer instead of Spark-managed spill.
    Default: half of physical RAM, clamped to [4g, 24g]; override with
    SPARK_GRAFT_DRIVER_MEM. On a real cluster this conf is the (small)
    driver only and spark-submit sizes executor memory."""
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    try:
        with open("/proc/meminfo", encoding="ascii") as f:
            total_kb = int(f.readline().split()[1])
        half_g = total_kb // (2 * 1024 * 1024)
        return f"{min(max(half_g, 4), 24)}g"
    except Exception:  # non-Linux / unreadable — conservative fallback
        return "8g"


DEFAULT_CONFS["spark.driver.memory"] = _default_driver_mem()


def get_spark_owned(
    app_name: str = "fineweb-domain-analyzer-spark",
    master: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> tuple[SparkSession, bool]:
    """(session, created): entry points use this so they only ever stop
    — or reconfigure — sessions they created themselves. When a
    SparkContext already exists the caller's session is returned
    UNTOUCHED (getOrCreate would silently apply DEFAULT_CONFS to it)."""
    from pyspark import SparkContext

    if SparkContext._active_spark_context is not None:
        existing = SparkSession.getActiveSession()
        if existing is None:  # context created in another thread
            existing = SparkSession.builder.getOrCreate()
        return existing, False
    return get_spark(app_name, master, extra_confs), True


def get_spark(
    app_name: str = "fineweb-domain-analyzer-spark",
    master: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS|*]`` so bench
    harnesses can pin parallelism; on a real cluster pass ``None`` and
    let spark-submit decide.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = builder.master(master)
    confs = dict(DEFAULT_CONFS)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
