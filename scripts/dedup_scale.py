#!/usr/bin/env python
"""End-to-end near-dedup at the ~million-doc scale: synth corpus +
planted near-duplicates → MinHash-LSH candidates → Jaccard verify.
Measures wall time, candidate fraction (vs all pairs — the number that
decides whether the approach survives 100×), and planted-pair recall.

Writes BENCH/dedup_scale.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_BASE = int(os.environ.get("FW_DEDUP_N", "1000000"))
DUP_EVERY = 20  # every 20th base doc gets a planted near-dup


def main() -> None:
    from pyspark.sql import functions as F

    from fineweb_domain_analyzer_spark.operators.dedup import (
        lsh_candidate_pairs,
        near_dedup_minhash,
    )
    from fineweb_domain_analyzer_spark.session import get_spark
    # corpus generated inline (see below) — synth_pages vocab is too small for dedup

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_confs={
            "spark.sql.shuffle.partitions": "64",
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    path = f"/tmp/fw_dedup_corpus_{N_BASE}"
    if not (Path(path) / "_SUCCESS").exists():
        # NOT synth_pages: its 36-word vocabulary makes every doc a
        # genuine near-dup of thousands of others (shingle space 36³),
        # which is a pathology no web corpus has — LSH correctly
        # returns the quadratic truth and the bench measures nothing.
        # Real corpora have ~10⁶⁺ vocabularies; 100k here keeps
        # cross-doc shingle collisions negligible so the candidate set
        # is the PLANTED dups plus hash noise.
        n_words = (F.abs(F.xxhash64(F.col("id"), F.lit(7))) % 101 + 30).cast(
            "int"
        )
        words = F.transform(
            F.sequence(F.lit(0), n_words - 1),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("id"), i, F.lit(7)), F.lit(100000)).cast(
                    "string"
                ),
            ),
        )
        base = spark.range(0, N_BASE, 1, 64).select(
            F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text")
        )
        # planted near-dup: copy with the last word dropped (high but
        # not perfect shingle Jaccard), disjoint id space
        dups = base.filter(F.col("doc_id") % DUP_EVERY == 0).select(
            (F.col("doc_id") + N_BASE).alias("doc_id"),
            F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
        )
        base.unionAll(dups).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    n_docs = docs.count()
    n_planted = n_docs - N_BASE

    # full pipeline FIRST and cold — caching the candidate frame before
    # this would let Spark's plan-matching serve the LSH subplan from
    # cache and understate the end-to-end time
    t1 = time.monotonic()
    verified = near_dedup_minhash(
        docs, threshold=0.8, k=16, bands=4, hash_family="xx"
    )
    n_verified = verified.count()
    t_full = round(time.monotonic() - t1, 2)

    t0 = time.monotonic()
    cands = lsh_candidate_pairs(docs, k=16, bands=4, hash_family="xx").cache()
    n_cands = cands.count()
    t_cand = round(time.monotonic() - t0, 2)

    # candidate recall of the planted pairs (id, id + N_BASE)
    hits = cands.filter(
        (F.col("id_b") - F.col("id_a") == N_BASE)
        & (F.col("id_a") % DUP_EVERY == 0)
    ).count()
    cands.unpersist()

    all_pairs = n_docs * (n_docs - 1) / 2
    out = {
        "n_docs": n_docs,
        "n_planted_dups": n_planted,
        "candidate_pairs": n_cands,
        "candidate_fraction_of_all_pairs": round(n_cands / all_pairs, 12),
        "planted_candidate_recall": round(hits / n_planted, 4),
        "verified_pairs_j08": n_verified,
        "lsh_candidates_sec": t_cand,
        "full_near_dedup_sec": t_full,
        "docs_per_sec_full": round(n_docs / t_full, 1),
        "config": {"k": 16, "bands": 4, "shingle_n": 3, "hash_family": "xx"},
    }
    (REPO / "BENCH" / "dedup_scale.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
