#!/usr/bin/env python
"""Cross-document span dedup at scale: ~300k synthetic web docs
(~80 tokens each, 100k-word vocabulary so natural 10-token collisions
are negligible), a 12-token boilerplate footer planted on every 10th
doc. Measures the detection (duplicated_span_profile) and removal
(remove_duplicated_spans) legs — wall time, docs/s, span-row count
(the explode factor that dominates the shuffle), planted recall, and
the exact token-removal accounting.

Writes BENCH/span_dedup.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N = int(os.environ.get("FW_SPAN_N", "300000"))
PLANT_EVERY = 10
BOILER = (
    "all rights reserved contact us terms of service privacy policy"
    " cookie notice"
)  # 12 tokens


def main() -> None:
    from pyspark.sql import functions as F

    from fineweb_domain_analyzer_spark.functions.textfns import ws_tokens
    from fineweb_domain_analyzer_spark.operators.dedup import (
        duplicated_span_profile,
        remove_duplicated_spans,
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
    path = f"/tmp/fw_span_corpus_{N}"
    if not (Path(path) / "_SUCCESS").exists():
        n_words = (F.abs(F.xxhash64(F.col("id"), F.lit(11))) % 101 + 30).cast(
            "int"
        )
        words = F.transform(
            F.sequence(F.lit(0), n_words - 1),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("id"), i, F.lit(11)), F.lit(100000))
                .cast("string"),
            ),
        )
        text = F.array_join(words, " ")
        text = F.when(
            F.col("id") % PLANT_EVERY == 0, F.concat(text, F.lit(" " + BOILER))
        ).otherwise(text)
        spark.range(0, N, 1, 64).select(
            F.col("id").alias("doc_id"), text.alias("text")
        ).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path).select(
        "doc_id", ws_tokens(F.lower(F.col("text"))).alias("_tk")
    )
    n_docs = docs.count()
    n_tokens = docs.select(F.sum(F.size("_tk"))).first()[0]
    n_planted = (N + PLANT_EVERY - 1) // PLANT_EVERY

    # detection leg (cold), both hash families. Recall counts the
    # INTERSECTION with the planted set — total flagged alone would let
    # false positives mask misses.
    t0 = time.monotonic()
    prof = duplicated_span_profile(docs, span_len=10, tokens_col="_tk")
    counts = prof.agg(
        F.count(F.lit(1)).alias("flagged"),
        F.sum(
            (F.col("doc_id") % PLANT_EVERY == 0).cast("long")
        ).alias("planted_hits"),
    ).first()
    flagged, planted_hits = counts["flagged"], counts["planted_hits"]
    t_profile = round(time.monotonic() - t0, 2)

    t0x = time.monotonic()
    flagged_xx = duplicated_span_profile(
        docs, span_len=10, tokens_col="_tk", hash_family="xx"
    ).count()
    t_profile_xx = round(time.monotonic() - t0x, 2)

    # removal leg (cold plan of its own — shares no cache)
    t1 = time.monotonic()
    rem = remove_duplicated_spans(docs, span_len=10, tokens_col="_tk")
    removed = rem.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens_removed").alias("tokens_removed"),
        F.sum((F.col("n_tokens_removed") > 0).cast("long")).alias("docs_cut"),
    ).first()
    t_remove = round(time.monotonic() - t1, 2)

    span_rows = n_tokens - 9 * n_docs  # sum(len-9) over docs with len>=10
    out = {
        "n_docs": n_docs,
        "n_tokens": int(n_tokens),
        "span_rows_exploded": int(span_rows),
        "n_planted_boiler_docs": n_planted,
        "profile_flagged_docs": flagged,
        "profile_planted_hits": int(planted_hits),
        "planted_detection_recall": round(planted_hits / n_planted, 4),
        "false_positive_docs": flagged - int(planted_hits),
        "removal_docs_cut": removed["docs_cut"],
        "removal_tokens_removed": int(removed["tokens_removed"]),
        # every planted doc except the canonical one loses exactly the
        # 12-token footer
        "expected_tokens_removed": 12 * (n_planted - 1),
        "profile_sec": t_profile,
        "profile_sec_xx": t_profile_xx,
        "profile_flagged_docs_xx": flagged_xx,
        "remove_sec": t_remove,
        "profile_docs_per_sec": round(n_docs / t_profile, 1),
        "profile_docs_per_sec_xx": round(n_docs / t_profile_xx, 1),
        "remove_docs_per_sec": round(n_docs / t_remove, 1),
        "profile_tokens_per_sec": round(n_tokens / t_profile, 1),
        "profile_tokens_per_sec_xx": round(n_tokens / t_profile_xx, 1),
        "config": {"span_len": 10, "min_docs": 2},
    }
    (REPO / "BENCH" / "span_dedup.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
