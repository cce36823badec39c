#!/usr/bin/env python
"""DSIR importance-weighting throughput at millions of documents.

Evidence for the operator's scale shape (operators/dsir.py): the gram
explode is map-side, the per-doc bucket counts are ONE shuffle, both
bucket models are <= n_buckets rows broadcast into the scoring join,
and the weight is one id-keyed aggregate — so wall time should scale
~linearly in corpus size with the model side constant. This bench
fits raw-vs-target models (B = 65536, the size a real deployment
would use) over synthetic corpora at two sizes and times (a) the
weight computation with the documented persist policy applied to the
gram counts, and (b) the full top-40% banded selection.

Also sanity-asserts the selection actually tilts toward the target
vocabulary (target-like docs overrepresented among the kept set).

Writes BENCH/dsir_bench.json. Run alone (no concurrent Spark JVMs).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_BUCKETS = 65536
SIZES = [500_000, 2_000_000]
TARGET_DOCS = 20_000


def build_docs(spark, n_docs: int):
    """Deterministic mixed corpus: 25% of docs use the 'curated'
    vocabulary (science words), 75% the 'web' vocabulary (boilerplate
    words); every doc is unique text (id-salted words)."""
    from pyspark.sql import functions as F

    def vocab_text(prefix: str):
        return F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit(f"{prefix}{j}_"),
                    ((F.col("id") * (j + 3)) % 257).cast("string"),
                )
                for j in range(15)
            ],
        )

    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, vocab_text("science"))
        .otherwise(vocab_text("web"))
        .alias("text"),
        (F.col("id") % 4 == 0).alias("is_targetlike"),
    )


def build_target(spark):
    from pyspark.sql import functions as F

    return spark.range(TARGET_DOCS).select(
        (F.col("id") + 50_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit(f"science{j}_"),
                    ((F.col("id") * (j + 5)) % 257).cast("string"),
                )
                for j in range(15)
            ],
        ).alias("text"),
    )


def run_case(spark, n_docs: int) -> dict:
    from pyspark.sql import functions as F

    from fineweb_domain_analyzer_spark.operators.dsir import (
        dsir_bucket_llr,
        hashed_ngram_counts,
    )
    from fineweb_domain_analyzer_spark.operators.quality import (
        keep_top_pct_by_group,
    )

    docs = build_docs(spark, n_docs).persist()
    docs.count()
    target = build_target(spark)

    t0 = time.time()
    # documented lineage policy: persist the gram counts — they feed
    # the raw model AND the scoring join
    counts = hashed_ngram_counts(docs, n_buckets=N_BUCKETS).persist()
    tcounts = hashed_ngram_counts(target, n_buckets=N_BUCKETS)
    llr = dsir_bucket_llr(counts, tcounts, n_buckets=N_BUCKETS)
    weights = (
        counts.join(F.broadcast(llr), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("llr_micro")).alias("w"))
        .persist()
    )
    n_weighted = weights.count()
    weight_sec = round(time.time() - t0, 2)

    t1 = time.time()
    kept = keep_top_pct_by_group(
        weights.withColumn("_g", F.lit(1)),
        40,
        score_col="w",
        by_col="_g",
        id_col="doc_id",
    )
    kept_stats = (
        kept.join(docs.select("doc_id", "is_targetlike"), "doc_id")
        .agg(
            F.count(F.lit(1)).alias("kept"),
            F.sum(F.col("is_targetlike").cast("long")).alias("kept_targetlike"),
        )
        .collect()[0]
    )
    select_sec = round(time.time() - t1, 2)

    out = {
        "n_docs": n_docs,
        "n_buckets": N_BUCKETS,
        "weight_sec": weight_sec,
        "weight_docs_per_sec": round(n_docs / weight_sec, 1),
        "select_sec": select_sec,
        "kept": int(kept_stats["kept"]),
        "kept_targetlike": int(kept_stats["kept_targetlike"]),
        "targetlike_in_corpus_pct": 25.0,
        "targetlike_in_kept_pct": round(
            100.0 * kept_stats["kept_targetlike"] / kept_stats["kept"], 1
        ),
    }
    assert n_weighted == n_docs
    # the selection must tilt hard toward the target vocabulary
    assert out["targetlike_in_kept_pct"] > 50.0, out
    weights.unpersist()
    counts.unpersist()
    docs.unpersist()
    return out


def main() -> None:
    from fineweb_domain_analyzer_spark.session import get_spark

    spark = get_spark(
        app_name="dsir-bench",
        master="local[32]",
        extra_confs={
            "spark.sql.shuffle.partitions": "64",
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    run_case(spark, 50_000)  # JVM/codegen warm-up
    cases = [run_case(spark, n) for n in SIZES]
    for c in cases:
        print(c, flush=True)
    small, big = cases
    result = {
        "cases": cases,
        "scaling": {
            "size_ratio": round(big["n_docs"] / small["n_docs"], 1),
            "weight_sec_ratio": round(
                big["weight_sec"] / max(small["weight_sec"], 1e-9), 2
            ),
            "note": (
                "4x corpus should cost ~4x weight wall time (linear: one "
                "count shuffle + broadcast model join + one id agg); the "
                "model side (bucket tables, broadcast) is constant-size"
            ),
        },
    }
    out = REPO / "BENCH" / "dsir_bench.json"
    out.write_text(json.dumps(result, indent=2) + "\n", encoding="utf-8")
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
