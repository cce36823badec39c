#!/usr/bin/env python
"""Serving cost of the trained-classifier gate: the flagship pipeline
with and without PipelineConfig.quality_weights, interleaved A/B/A/B in
one JVM over the same cached synthetic pages. The gate is one codegen
scoring projection + one CASE branch — expected ≈ free. Writes
BENCH/classifier_gate.json."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    rows = int(os.environ.get("FW_GATE_ROWS", "2400000"))
    from fineweb_domain_analyzer_spark.operators.metrics import filter_stats
    from fineweb_domain_analyzer_spark.operators.quality import (
        QUALITY_LOGIT_WEIGHTS,
    )
    from fineweb_domain_analyzer_spark.plans.pipeline import (
        PipelineConfig,
        quality_filter_pipeline,
    )
    from fineweb_domain_analyzer_spark.session import get_spark
    from fineweb_domain_analyzer_spark.sources.pages import (
        synth_pages,
        synth_policy_for_domains,
    )

    spark = get_spark(
        app_name="fw-gate-bench",
        master="local[32]",
        extra_confs={
            "spark.sql.shuffle.partitions": "64",
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    cache = f"/tmp/fw_gate_pages_{rows}"
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        synth_pages(spark, rows, n_domains=2000, seed=42, partitions=64).write.mode(
            "overwrite"
        ).parquet(cache)
    pages = spark.read.parquet(cache)
    policy = synth_policy_for_domains(spark, 2000)

    cfgs = {
        "baseline": PipelineConfig(),
        "gated": PipelineConfig(quality_weights=dict(QUALITY_LOGIT_WEIGHTS)),
    }

    def run(name: str) -> tuple[float, int]:
        t0 = time.time()
        stats = filter_stats(
            quality_filter_pipeline(pages, policy, cfgs[name])
        ).collect()[0]
        return time.time() - t0, int(stats["total_processed"])

    # warm-up both plan shapes (Janino + JIT), then interleaved visits
    for name in cfgs:
        run(name)
    best = {name: float("inf") for name in cfgs}
    docs = rows
    for _ in range(3):
        for name in cfgs:
            sec, docs = run(name)
            best[name] = min(best[name], sec)
    result = {
        "what": "flagship pipeline with vs without the trained-classifier "
                "gate (PipelineConfig.quality_weights), one JVM, "
                "interleaved best-of-3",
        "rows": docs,
        "baseline_sec": round(best["baseline"], 3),
        "gated_sec": round(best["gated"], 3),
        "baseline_docs_per_sec": round(docs / best["baseline"], 1),
        "gated_docs_per_sec": round(docs / best["gated"], 1),
        "gate_overhead": round(best["gated"] / best["baseline"] - 1.0, 4),
    }
    (REPO / "BENCH" / "classifier_gate.json").write_text(
        json.dumps(result, indent=2) + "\n"
    )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
