#!/usr/bin/env python
"""Incremental cross-dump dedup at the 1M+1M scale: ingest dump1 into
a DedupIndex, then ingest dump2 (with planted cross-exact and
cross-near dups of dump1 plus its own intra dups) and measure the
incremental leg. The headline ratio compares the incremental dump2
pass against the from-scratch alternative (re-deduping dump1+dump2
together), the cost the index exists to avoid.

Writes BENCH/incremental_dedup.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N = int(os.environ.get("FW_INC_N", "1000000"))  # docs per dump
CROSS_EXACT_EVERY = 40  # dump2 copies every 40th dump1 doc verbatim
CROSS_NEAR_EVERY = 40  # ... and a near-mutated copy of every 40th+1


def synth(spark, n, seed, start_id):
    """Same corpus model as dedup_scale.py: ~100k vocabulary so shingle
    collisions are hash noise, not wall-to-wall genuine near-dups."""
    from pyspark.sql import functions as F

    n_words = (F.abs(F.xxhash64(F.col("id"), F.lit(seed))) % 101 + 30).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("id"), i, F.lit(seed)), F.lit(100000)).cast(
                "string"
            ),
        ),
    )
    return spark.range(0, n, 1, 64).select(
        (F.col("id") + start_id).alias("doc_id"),
        F.array_join(words, " ").alias("text"),
    )


def main() -> None:
    from pyspark.sql import functions as F

    from fineweb_domain_analyzer_spark.operators.dedup import near_dedup_minhash
    from fineweb_domain_analyzer_spark.operators.incremental_dedup import DedupIndex
    from fineweb_domain_analyzer_spark.session import get_spark

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_confs={
            "spark.sql.shuffle.partitions": "64",
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )

    d1_path = f"/tmp/fw_inc_dump1_{N}"
    d2_path = f"/tmp/fw_inc_dump2_{N}"
    if not (Path(d1_path) / "_SUCCESS").exists():
        synth(spark, N, 7, 0).write.mode("overwrite").parquet(d1_path)
    if not (Path(d2_path) / "_SUCCESS").exists():
        dump1 = spark.read.parquet(d1_path)
        fresh = synth(spark, N, 11, 10_000_000)
        xexact = dump1.filter(F.col("doc_id") % CROSS_EXACT_EVERY == 0).select(
            (F.col("doc_id") + 20_000_000).alias("doc_id"), "text"
        )
        xnear = dump1.filter(F.col("doc_id") % CROSS_NEAR_EVERY == 1).select(
            (F.col("doc_id") + 30_000_000).alias("doc_id"),
            F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
        )
        fresh.unionAll(xexact).unionAll(xnear).write.mode("overwrite").parquet(
            d2_path
        )

    dump1 = spark.read.parquet(d1_path)
    dump2 = spark.read.parquet(d2_path)
    n1, n2 = dump1.count(), dump2.count()

    idx_root = f"/tmp/fw_inc_index_{N}"
    shutil.rmtree(idx_root, ignore_errors=True)
    idx = DedupIndex(spark, idx_root, threshold=0.75, hash_family="xx")

    t0 = time.time()
    lab1 = idx.ingest_batch(dump1, "dump1")
    kept1 = lab1.filter("keep").count()
    t_ingest1 = round(time.time() - t0, 2)

    t0 = time.time()
    lab2 = idx.ingest_batch(dump2, "dump2")
    reasons = {
        r["drop_reason"]: r["n"]
        for r in lab2.groupBy("drop_reason").agg(F.count("*").alias("n")).collect()
    }
    t_ingest2 = round(time.time() - t0, 2)

    planted_xe = n1 // CROSS_EXACT_EVERY
    planted_xn = (n1 + CROSS_NEAR_EVERY - 2) // CROSS_NEAR_EVERY
    xe_recall = round(reasons.get("exact_dup_cross", 0) / planted_xe, 4)
    # near recall: sig-estimate vs planted one-word-dropped mutations
    xn_recall = round(reasons.get("near_dup_cross", 0) / planted_xn, 4)

    # from-scratch alternative: near-dedup dump1+dump2 together — the
    # recompute the incremental index avoids
    t0 = time.time()
    both = dump1.unionAll(dump2)
    pairs = near_dedup_minhash(both, threshold=0.75, hash_family="xx")
    n_pairs = pairs.count()
    t_scratch = round(time.time() - t0, 2)

    out = {
        "n_dump1": n1,
        "n_dump2": n2,
        "kept_dump1": kept1,
        "dump2_reasons": reasons,
        "planted_cross_exact": planted_xe,
        "planted_cross_near": planted_xn,
        "cross_exact_recall": xe_recall,
        "cross_near_recall_sig_estimate": xn_recall,
        "ingest1_sec": t_ingest1,
        "ingest2_sec": t_ingest2,
        "ingest2_docs_per_sec": round(n2 / t_ingest2, 1),
        "from_scratch_pair_sec": t_scratch,
        "from_scratch_pairs": n_pairs,
        "incremental_vs_scratch_speedup": round(t_scratch / t_ingest2, 2),
        "config": {
            "threshold": 0.75,
            "k": 16,
            "bands": 4,
            "hash_family": "xx",
            "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        },
        "note": (
            "ingest2 includes labeling dump2 against the stored dump1 "
            "index (exact md5 join + band join + sig-estimate verify), "
            "dump2's own intra near-dedup, and committing dump2's index "
            "partition; dump1 is never re-read. from_scratch is the "
            "non-incremental alternative: near-dedup over dump1+dump2 "
            "unioned (pair generation only, no relabel/commit)."
        ),
    }
    (REPO / "BENCH").mkdir(exist_ok=True)
    with open(REPO / "BENCH" / "incremental_dedup.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
