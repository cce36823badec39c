#!/usr/bin/env python
"""Domain-suffix blocklist at UT1 scale: 3M pages matched against a
4M-entry blocklist (the size of the real UT1 adult list) through
with_domain_blocked's per-depth broadcast joins. Measures wall time,
docs/s, and verifies the planted hit accounting — the evidence that
the label-count-partitioned broadcast design carries a real blocklist.

Writes BENCH/blocklist_bench.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_PAGES = int(os.environ.get("FW_BL_PAGES", "3000000"))
N_BLOCK = int(os.environ.get("FW_BL_ENTRIES", "4000000"))


def main() -> None:
    from pyspark.sql import functions as F

    from fineweb_domain_analyzer_spark.functions.domains import (
        with_domain_blocked,
    )
    from fineweb_domain_analyzer_spark.session import get_spark

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_confs={
            "spark.sql.shuffle.partitions": "64",
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    # pages: hosts over ~1M distinct zones, 3 labels, 20% with an extra
    # subdomain. Every 10th page lands in a blocked zone (zone id < 10%
    # of N_BLOCK's zone space) — ~10% planted hit rate.
    zone = F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(N_BLOCK)).cast("long")
    host = F.concat(
        F.when(F.col("id") % 5 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("h"),
        (F.col("id") % 997).cast("string"),
        F.lit(".zone"),
        zone.cast("string"),
        F.lit(".example.com"),
    )
    pages = spark.range(0, N_PAGES, 1, 64).select(
        F.col("id").alias("doc_id"), host.alias("domain"), zone.alias("_zone")
    )
    # blocklist: one 3-label entry per zone id < N_BLOCK/10 (these can
    # match), the rest 4-label decoys that never match (realistic: most
    # of a blocklist is irrelevant to any given crawl slice)
    bl = spark.range(0, N_BLOCK, 1, 64).select(
        F.when(
            F.col("id") < N_BLOCK // 10,
            F.concat(F.lit("zone"), F.col("id").cast("string"), F.lit(".example.com")),
        )
        .otherwise(
            F.concat(
                F.lit("deco.y"),
                F.col("id").cast("string"),
                F.lit(".decoys.net"),
            )
        )
        .alias("bd")
    )
    expected_hits = pages.filter(F.col("_zone") < N_BLOCK // 10).count()

    t0 = time.monotonic()
    out = with_domain_blocked(pages.drop("_zone"), bl)
    hits = out.filter(F.col("blocked_by").isNotNull()).count()
    t = round(time.monotonic() - t0, 2)

    res = {
        "n_pages": N_PAGES,
        "n_blocklist_entries": N_BLOCK,
        "expected_hits": expected_hits,
        "hits": hits,
        "hit_accounting_exact": hits == expected_hits,
        "wall_sec": t,
        "pages_per_sec": round(N_PAGES / t, 1),
    }
    (REPO / "BENCH" / "blocklist_bench.json").write_text(
        json.dumps(res, indent=1) + "\n"
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
