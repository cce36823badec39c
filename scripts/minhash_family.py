#!/usr/bin/env python
"""md5 vs xxhash64 MinHash signature families: identical LSH plan,
different map-stage cost — this times the part that differs (the
signature computation; banding/bucket-join downstream are shared).
Writes BENCH/minhash_family.json.

The corpus is the sf documents table replicated to ~100k rows with
distinct ids; replication doesn't distort a pure map-stage measurement
(no joins here — the bucket join on this heavily-templated synthetic
text would measure bucket blow-up, not hash cost)."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGET_ROWS = 100_000


def main() -> None:
    from pyspark.sql import functions as F

    from fineweb_domain_analyzer_spark.functions.textfns import ws_tokens
    from fineweb_domain_analyzer_spark.operators.dedup import (
        minhash_signature_from_shingles,
        minhash_signature_from_shingles_xx,
        word_shingles_from_tokens,
    )
    from fineweb_domain_analyzer_spark.session import get_spark

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_confs={
            "spark.sql.shuffle.partitions": "32",
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    base = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    n_base = base.count()
    copies = max(1, TARGET_ROWS // n_base)
    docs = (
        base.crossJoin(spark.range(copies).select(F.col("id").alias("_c")))
        .select(
            (F.col("doc_id") * copies + F.col("_c")).alias("doc_id"), "text"
        )
        .repartition(64)
        .cache()
    )
    n = docs.count()

    def timed(sig_fn) -> float:
        def plan():
            shingled = docs.select(
                "doc_id", ws_tokens(F.lower(F.col("text"))).alias("_tk")
            ).select(
                "doc_id", word_shingles_from_tokens(F.col("_tk")).alias("_sh")
            )
            return shingled.select("doc_id", sig_fn(F.col("_sh"), 16).alias("_sig"))

        plan().limit(2000).write.mode("overwrite").format("noop").save()  # codegen warm-up
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            plan().write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        return best

    md5_s = timed(minhash_signature_from_shingles)
    xx_s = timed(minhash_signature_from_shingles_xx)
    result = {
        "docs": n,
        "sf_dir": SF,
        "k": 16,
        "md5_sec": round(md5_s, 3),
        "xx_sec": round(xx_s, 3),
        "md5_docs_per_sec": round(n / md5_s, 1),
        "xx_docs_per_sec": round(n / xx_s, 1),
        "speedup": round(md5_s / xx_s, 2),
        "note": (
            "signature map stage only (k=16 minhashes over 3-gram "
            "shingles); banding/bucket join are identical between "
            "families. xx = xxhash64 (JVM-native 64-bit, production), "
            "md5 = engine-portable oracle family."
        ),
    }
    (REPO / "BENCH" / "minhash_family.json").write_text(
        json.dumps(result, indent=2) + "\n"
    )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
