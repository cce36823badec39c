#!/usr/bin/env python
"""Scale evidence for the curation-audit operators (q101/q102/q107):
rule_ablation + rule_overlap + data_card over the full flagship feature
chain on a multi-million-doc corpus at N and 4N cores.

The claim under test: the audit adds ZERO extra shuffles — fire bits
and cube keys ride the pipeline's single map stage, and the outputs
are one 1-row (ablation/overlap) or O(reasons×langs) (card) aggregate.
If that holds, audit throughput ≈ pipeline throughput and scales with
cores like the pipeline does. Writes BENCH/ablation_bench.json.
Run alone (no concurrent Spark JVMs).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["FW_REPO"])
from pyspark.sql import functions as F
from fineweb_domain_analyzer_spark.session import get_spark
from fineweb_domain_analyzer_spark.plans.pipeline import (
    REASON_CLASSIFIER, REASON_KEPT, REASON_LANGUAGE, REASON_QUALITY,
    PipelineConfig, quality_filter_pipeline,
)
from fineweb_domain_analyzer_spark.operators.metrics import (
    data_card, rule_ablation, rule_overlap,
)
from fineweb_domain_analyzer_spark.sources.pages import (
    synth_pages, synth_policy_for_domains,
)

cores = int(os.environ["FW_CORES"])
rows = int(os.environ["FW_ROWS"])
cache = os.environ["FW_CACHE"]
spark = get_spark(
    app_name=f"fw-ablation-{cores}",
    master=f"local[{cores}]",
    extra_confs={
        "spark.sql.shuffle.partitions": str(cores * 2),
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
    },
)
if not os.path.exists(os.path.join(cache, "_SUCCESS")):
    synth_pages(spark, rows, n_domains=2000, seed=42, partitions=64).write.mode(
        "overwrite").parquet(cache)
pages = spark.read.parquet(cache)
policy = synth_policy_for_domains(spark, 2000)
cfg = PipelineConfig(scrub=False)


def audited():
    out = quality_filter_pipeline(pages, policy, cfg)
    non_robots = (REASON_KEPT, REASON_LANGUAGE, REASON_QUALITY, REASON_CLASSIFIER)
    rules = {
        "robots": ~F.col("drop_reason").isin(*non_robots),
        "language": ~F.col("langid").isin(*cfg.allowed_langs),
        "word_count": ~F.col("word_count").between(cfg.min_words, cfg.max_words),
        "mean_word_len": ~F.col("mean_word_len").between(2.0, 12.0),
        "symbol_ratio": F.col("symbol_ratio") > cfg.max_symbol_ratio,
        "stopword_density": F.col("stopword_density") < 0.0,
        "repeat_ratio": F.col("max_word_repeat_ratio") > cfg.max_repeat_ratio,
    }
    return out, rules


def run_all():
    out, rules = audited()
    n1 = len(rule_ablation(out, rules).collect())
    out, rules = audited()
    n2 = len(rule_overlap(out, rules).collect())
    out, _ = audited()
    n3 = len(data_card(out).collect())
    return n1 + n2 + n3


run_all()  # warm (Janino + JIT + Arrow workers)
best = float("inf")
for _ in range(2):
    t0 = time.time()
    out_rows = run_all()
    best = min(best, time.time() - t0)
# three audit passes per run_all ⇒ docs processed = 3 × rows
print(json.dumps({
    "cores": cores, "sec": round(best, 3), "rows": rows,
    "audit_passes": 3, "out_rows": out_rows,
    "docs_per_sec": round(3 * rows / best, 1),
}))
spark.stop()
"""


def run_level(cores: int, rows: int, cache: str) -> dict:
    env = dict(
        os.environ,
        FW_REPO=str(REPO),
        FW_CORES=str(cores),
        FW_ROWS=str(rows),
        FW_CACHE=cache,
    )
    out = subprocess.run(
        [sys.executable, "-c", RUNNER], env=env, capture_output=True,
        text=True, timeout=3000,
    )
    for line in reversed(out.stdout.splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


def main() -> None:
    rows = int(os.environ.get("ABLATION_BENCH_ROWS", "2400000"))
    cache = f"/tmp/fw_scaling_pages_{rows}"
    lo = run_level(8, rows, cache)
    hi = run_level(32, rows, cache)
    eff = round(hi["docs_per_sec"] / (4 * lo["docs_per_sec"]), 3)
    result = {"N": lo, "4N": hi, "efficiency": eff}
    path = REPO / "BENCH" / "ablation_bench.json"
    path.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
