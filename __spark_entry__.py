"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship robots-filter query on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (plus
the training-data-pipeline extensions); ``oracle_sql()`` gives the
DuckDB-runnable ANSI-SQL equivalent for each (all are SQL-expressible).

Implementation lives in ``fineweb_domain_analyzer_spark.queries``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fineweb_domain_analyzer_spark import merged as _m
from fineweb_domain_analyzer_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.q12_robots_filter(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Every computed/aggregate column is aliased identically in the Spark
    code and the oracle SQL.

    The registry is the CONSOLIDATED one (≤ 50 keys): same-granularity
    operators are merged into wide frames / method-tagged unions so
    every operator sits inside the driver gate's 50-sorted-key window
    with a value-level oracle. The fine-grained originals remain in
    ``fineweb_domain_analyzer_spark.queries.QUERIES`` (checked locally
    via ``FULL=1 scripts/check_oracle.py``).
    """
    return _m.exposed_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every key in ``queries()``."""
    return _m.exposed_oracle_sql()
