#!/usr/bin/env python
"""Overhead of the opt-in flagship gates (page-type, doc-shape) on the
end-to-end pipeline: docs/s with the default reference-parity config vs
each gate on vs both on, same 300k-doc synth corpus as bench.py.

Both gates are pure codegen column work fused into the one map stage
(PLANS evidence: exchange-count parity), so the expected cost is the
extra per-row regex/array scans only. Writes BENCH/gates_overhead.json.
Run alone (no concurrent Spark JVMs).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ROWS = int(os.environ.get("GATES_BENCH_ROWS", "300000"))
REPS = int(os.environ.get("GATES_BENCH_REPS", "3"))


def median(xs):
    s = sorted(xs)
    return s[len(s) // 2]


def main() -> None:
    from fineweb_domain_analyzer_spark.operators.metrics import filter_stats
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
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_confs={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    cache = f"/tmp/fw_bench_pages_{ROWS}"
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        synth_pages(spark, ROWS, n_domains=2000, seed=42).write.mode(
            "overwrite"
        ).parquet(cache)
    pages = spark.read.parquet(cache)
    policy = synth_policy_for_domains(spark, 2000)

    configs = {
        "baseline": PipelineConfig(),
        "page_type": PipelineConfig(
            drop_page_types=("error_page", "login_wall", "parked_domain",
                             "cookie_wall", "placeholder")
        ),
        "doc_shape": PipelineConfig(enforce_doc_shape=True),
        "both": PipelineConfig(
            drop_page_types=("error_page", "login_wall", "parked_domain",
                             "cookie_wall", "placeholder"),
            enforce_doc_shape=True,
        ),
        "page_type_1k_window": PipelineConfig(
            drop_page_types=("error_page", "login_wall", "parked_domain",
                             "cookie_wall", "placeholder"),
            page_type_scan_chars=1024,
        ),
    }
    out: dict = {"rows": ROWS, "reps": REPS, "configs": {}}
    for name, cfg in configs.items():
        filter_stats(quality_filter_pipeline(pages, policy, cfg)).collect()  # warm
        secs = []
        for _ in range(REPS):
            t0 = time.time()
            stats = filter_stats(
                quality_filter_pipeline(pages, policy, cfg)
            ).collect()[0]
            secs.append(round(time.time() - t0, 3))
        sec = median(secs)
        out["configs"][name] = {
            "sec": sec,
            "docs_per_sec": round(ROWS / sec, 1),
            "samples_sec": secs,
            "kept": int(stats["filtered_kept"]),
        }
    base = out["configs"]["baseline"]["docs_per_sec"]
    for name, c in out["configs"].items():
        c["relative_throughput"] = round(c["docs_per_sec"] / base, 3)
    path = REPO / "BENCH" / "gates_overhead.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out["configs"], indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
