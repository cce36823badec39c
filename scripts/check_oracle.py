#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet,
then compare row count, schema (column names) and values
(order-insensitive, column-name-sorted — mirroring the driver's
value-hash).

Usage:
    python scripts/check_oracle.py            # all queries @ sf0.01
    python scripts/check_oracle.py q12 q19    # substring filters
    SF_DIR=/root/testdata/sf0.001 python scripts/check_oracle.py
"""

from __future__ import annotations

import math
import os
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        norm = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                norm.append(None)
            elif isinstance(v, float):
                norm.append(round(v, 9))
            elif hasattr(v, "item"):  # numpy scalar
                item = v.item()
                norm.append(round(item, 9) if isinstance(item, float) else item)
            else:
                norm.append(v)
        rows.append(tuple(norm))
    return sorted(rows, key=repr)


def main() -> int:
    filters = sys.argv[1:]
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")

    import __spark_entry__ as entrymod
    from fineweb_domain_analyzer_spark.session import get_spark

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        extra_confs={
            "spark.sql.shuffle.partitions": "16",
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    if os.environ.get("FULL"):
        from fineweb_domain_analyzer_spark import merged

        qs = merged.full_queries()
        oracles = merged.full_oracle_sql()
    else:
        qs = entrymod.queries()
        oracles = entrymod.oracle_sql()
    failed, passed = [], []
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            spark_df = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(spark_df)} rows)")
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failed.append(name)
            continue
        dt = time.time() - t0
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            print(
                f"FAIL {name}: columns {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}"
            )
            failed.append(name)
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            failed.append(name)
            continue
        a, b = normalize(spark_df), normalize(duck_df)
        if a != b:
            n_bad = sum(1 for x, y in zip(a, b) if x != y)
            print(f"FAIL {name}: {n_bad}/{len(a)} rows differ; first diff:")
            for x, y in zip(a, b):
                if x != y:
                    print(f"  spark: {x}\n  duck : {y}")
                    break
            failed.append(name)
        else:
            print(f"PASS {name} ({len(a)} rows, {dt:.1f}s)")
            passed.append(name)
    print(f"\n{len(passed)} passed, {len(failed)} failed")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
