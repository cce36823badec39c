#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north rule, sandbox form):
run the identical end-to-end quality-filter job on the identical input
at N and 4N cores (local[8] vs local[32]), report docs/sec at both and
efficiency = thr_4N / (4 × thr_N). Writes BENCH/BASELINE.md.

Each parallelism level runs in a fresh subprocess (a JVM can't be
re-mastered in-process); shuffle partitions scale with cores.
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
from fineweb_domain_analyzer_spark.session import get_spark
from fineweb_domain_analyzer_spark.plans.pipeline import quality_filter_pipeline
from fineweb_domain_analyzer_spark.operators.metrics import filter_stats
from fineweb_domain_analyzer_spark.sources.pages import synth_pages, synth_policy_for_domains

cores = int(os.environ["FW_CORES"])
rows = int(os.environ["FW_ROWS"])
cache = os.environ["FW_CACHE"]
spark = get_spark(
    app_name=f"fw-scaling-{cores}",
    master=f"local[{cores}]",
    extra_confs={
        "spark.sql.shuffle.partitions": str(cores * 2),
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
    },
)
if not os.path.exists(os.path.join(cache, "_SUCCESS")):
    synth_pages(spark, rows, n_domains=2000, seed=42, partitions=64).write.mode("overwrite").parquet(cache)
pages = spark.read.parquet(cache)
policy = synth_policy_for_domains(spark, 2000)
# A fresh DataFrame per run: re-collecting one plan instance would
# reuse its materialized exchange and skip the work entirely. Each
# measured run therefore pays ~2 s of driver-side Catalyst planning —
# a per-query constant identical at both cluster sizes — which the
# input size (default 2.4M docs) amortizes to noise. Warm-up run
# first (Janino compile + JIT), then best of 2.
filter_stats(quality_filter_pipeline(pages, policy)).collect()
best = float("inf")
for _ in range(2):
    t0 = time.time()
    stats = filter_stats(quality_filter_pipeline(pages, policy)).collect()[0]
    best = min(best, time.time() - t0)
sec = best
print(json.dumps({"cores": cores, "sec": round(sec, 3),
                  "docs": int(stats["total_processed"]),
                  "docs_per_sec": round(stats["total_processed"] / sec, 1)}))
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
        [sys.executable, "-c", RUNNER], env=env, capture_output=True, text=True, timeout=1800
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"runner failed (cores={cores}):\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    rows = int(os.environ.get("FW_SCALING_ROWS", "4800000"))
    cache = f"/tmp/fw_scaling_pages_{rows}"
    # interleaved A/B/A/B visits: sandbox throughput drifts over
    # minutes, so measuring the two levels back-to-back once attributes
    # host swings to the cores axis; best-per-level across alternating
    # visits cancels the drift
    n = run_level(8, rows, cache)
    n4 = run_level(32, rows, cache)
    n_b = run_level(8, rows, cache)
    n4_b = run_level(32, rows, cache)
    if n_b["docs_per_sec"] > n["docs_per_sec"]:
        n = n_b
    if n4_b["docs_per_sec"] > n4["docs_per_sec"]:
        n4 = n4_b
    eff = round(n4["docs_per_sec"] / (4 * n["docs_per_sec"]), 3)
    result = {"N": n, "4N": n4, "efficiency": eff}
    print(json.dumps(result))
    md = f"""# BENCH/BASELINE — scaling-efficiency evidence

North rule: throughput scaling efficiency ≥ 0.8 between N- and
4N-executor clusters. Sandbox form (no real cluster): the identical
end-to-end quality-filter job (synthetic Zipf pages, seed 42,
{rows:,} docs, cached parquet input) at `local[8]` vs `local[32]`,
`spark.sql.shuffle.partitions` = 2× cores, fresh JVM per level; one
warm-up execution (Janino compile + JIT), then best-of-2 measured
runs, each building its plan fresh (re-collecting a cached plan would
reuse its materialized exchange and skip the work). Levels run as
interleaved A/B/A/B visits (best per level) so minute-scale host
drift cancels instead of loading onto the cores axis. The ~2 s of
per-run driver planning is a constant identical at both levels; the
input size amortizes it to noise.

| level | cores | wall sec | docs/sec |
|---|---|---|---|
| N  | 8  | {n['sec']} | {n['docs_per_sec']:,} |
| 4N | 32 | {n4['sec']} | {n4['docs_per_sec']:,} |

**efficiency = thr_4N / (4 × thr_N) = {eff}** (target ≥ 0.8)

Caveats: local-mode cores share one JVM heap, memory bandwidth and the
Python-UDF worker pool, so this understates multi-node scaling where
each executor brings its own memory channels; the plan itself is
shuffle-free up to the final metrics aggregation (broadcast join +
map-side ops), which is the property that actually transfers to a
1000-executor cluster. Measured efficiency can land near or even
above 1.0: this sandbox's many-core wall times swing ~2x
(BENCH/host_variance.json) and per-JVM fixed costs (GC, Python
worker-pool startup) amortize better at higher parallelism — read
values >= 1 as "no scaling bottleneck observed at 4x cores," not as
true super-linearity.
"""
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "BASELINE.md").write_text(md)
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
