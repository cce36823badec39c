#!/usr/bin/env python
"""End-to-end curation-chain throughput (default 200k docs, FW_CAPSTONE_N
to scale): quality score →
threshold → exact dedup → per-language banded cut → packing placement
(the q70 composition) over a synthetic multilingual corpus with planted
exact duplicates. Measures wall time, docs/s, and the funnel counts at
each stage boundary (verifiable arithmetic, not a black box).

Writes BENCH/capstone_bench.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N = int(os.environ.get("FW_CAPSTONE_N", "200000"))


def main() -> None:
    from pyspark.sql import functions as F

    from fineweb_domain_analyzer_spark.operators.dedup import (
        exact_dedup_keep_first,
    )
    from fineweb_domain_analyzer_spark.operators.quality import (
        keep_top_pct_by_group,
        plan_sequence_packing,
        with_quality_features,
        with_quality_score,
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
    path = f"/tmp/fw_capstone_corpus_{N}"
    if not (Path(path) / "_SUCCESS").exists():
        # every 25th doc is an exact copy of its predecessor (planted
        # exact dups the dedup stage must fold)
        src = F.when(
            F.col("id") % 25 == 0, F.col("id") + 1
        ).otherwise(F.col("id"))
        words = F.transform(
            F.sequence(F.lit(0), (F.abs(F.xxhash64(src, F.lit(13))) % 151 + 20).cast("int") - 1),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(src, i, F.lit(13)), F.lit(50000))
                .cast("string"),
            ),
        )
        lang = F.element_at(
            F.array(F.lit("en"), F.lit("en"), F.lit("en"), F.lit("fr"),
                    F.lit("de"), F.lit("es")),
            (F.pmod(F.xxhash64(F.col("id"), F.lit(17)), F.lit(6)) + 1).cast("int"),
        )
        text = F.array_join(words, " ")
        # every 9th doc becomes short symbol-dominated junk (scores
        # ~0.03) so the score-threshold stage has real selectivity
        text = F.when(
            F.col("id") % 9 == 0, F.lit("$$$ ### %%% @@@")
        ).otherwise(text)
        spark.range(0, N, 1, 64).select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            lang.alias("lang"),
        ).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    n_docs = docs.count()
    from pyspark import StorageLevel

    # Stage 0 (timed separately): score the corpus ONCE and persist —
    # the downstream curation legs are iterative consumers (the banded
    # cut alone runs several small aggregates over its input), so a
    # real pipeline materializes the scored table first rather than
    # re-executing the feature lineage per aggregate.
    t_s = time.monotonic()
    scored = with_quality_score(with_quality_features(docs)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    scored.count()
    t_score = round(time.monotonic() - t_s, 2)

    t0 = time.monotonic()
    k1 = scored.filter(F.col("quality_score") >= 0.5)
    k2 = exact_dedup_keep_first(k1, "doc_id", "text")
    k3 = keep_top_pct_by_group(
        k2, 60, score_col="quality_score", by_col="lang", id_col="doc_id"
    )
    packed = plan_sequence_packing(
        k3, seq_len=2048, n_shards=64, tokens_col="word_count"
    )
    funnel = packed.agg(
        F.count(F.lit(1)).alias("placed_docs"),
        F.sum("tokens").alias("placed_tokens"),
        (F.max(F.col("start_seq")) + 1).alias("max_seqs_per_shard"),
    ).first()
    t = round(time.monotonic() - t0, 2)

    # stage counts (evidence pass — persisted boundaries so each stage
    # runs once instead of re-executing the whole upstream chain)
    k1p = k1.persist(StorageLevel.MEMORY_AND_DISK)
    c1 = k1p.count()
    k2p = exact_dedup_keep_first(k1p, "doc_id", "text").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    c2 = k2p.count()
    c3 = keep_top_pct_by_group(
        k2p, 60, score_col="quality_score", by_col="lang", id_col="doc_id"
    ).count()
    k1p.unpersist()
    k2p.unpersist()
    out = {
        "n_docs": n_docs,
        "after_score_threshold": c1,
        "after_exact_dedup": c2,
        "after_language_cut": c3,
        "placed_docs": funnel["placed_docs"],
        "placed_tokens": int(funnel["placed_tokens"]),
        "max_seqs_per_shard": int(funnel["max_seqs_per_shard"]),
        "score_wall_sec": t_score,
        "score_docs_per_sec": round(n_docs / t_score, 1),
        "chain_wall_sec": t,
        "chain_docs_per_sec": round(n_docs / t, 1),
        "threshold_cut_docs": n_docs - c1,
        "language_cut_is_60pct": abs(c3 - 0.6 * c2) <= 6,  # <=1 per lang
        "config": {"seq_len": 2048, "n_shards": 64, "pct": 60},
    }
    (REPO / "BENCH" / "capstone_bench.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
