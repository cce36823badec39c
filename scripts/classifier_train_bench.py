#!/usr/bin/env python
"""Classifier-training evidence (q80, operators/training.py):

1. Gradient-pass throughput at N (local[8]) and 4N (local[32]) cores
   over the same cached 2M-row feature frame — scaling efficiency for
   the training loop itself (north-rule form: same job, two
   parallelism levels, fresh JVM per level, interleaved A/B/A/B).
2. Cross-parallelism DETERMINISM: the folded weights learned at 8 and
   32 cores must be bit-identical (the integer-exact gradient
   contract) — the property that makes the q80 oracle possible and
   makes cluster-size changes a no-op for model outputs.

Writes BENCH/classifier_train.json.
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
from fineweb_domain_analyzer_spark.operators.quality import gopher_keep
from fineweb_domain_analyzer_spark.operators.training import train_quality_classifier

cores = int(os.environ["FW_CORES"])
rows = int(os.environ["FW_ROWS"])
iters = int(os.environ["FW_ITERS"])
cache = os.environ["FW_CACHE"]
spark = get_spark(
    app_name=f"fw-train-{cores}",
    master=f"local[{cores}]",
    extra_confs={
        "spark.sql.shuffle.partitions": str(cores * 2),
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
    },
)
if not os.path.exists(os.path.join(cache, "_SUCCESS")):
    # deterministic synthetic feature frame (id-derived modular
    # arithmetic — exact integers, no RNG), teacher label = the same
    # Gopher gate q80 distills
    df = spark.range(0, rows, 1, 64).select(
        F.col("id"),
        (F.lit(5) + (F.col("id") * 2654435761) % 2000).alias("word_count"),
        (F.lit(2.0) + ((F.col("id") * 40503) % 1000) / 100.0).alias("mean_word_len"),
        (((F.col("id") * 97) % 100) / 200.0).alias("symbol_ratio"),
        (((F.col("id") * 31) % 100) / 250.0).alias("stopword_density"),
        (((F.col("id") * 7) % 100) / 120.0).alias("max_word_repeat_ratio"),
    )
    gate = gopher_keep(
        F.col("word_count").cast("int"),
        F.col("mean_word_len"),
        F.col("symbol_ratio"),
        F.col("stopword_density"),
        F.col("max_word_repeat_ratio"),
    )
    df.withColumn("distill_label", F.coalesce(gate, F.lit(False))).write.mode(
        "overwrite"
    ).parquet(cache)
feats = spark.read.parquet(cache)
# warm-up: Janino + JIT + parquet footer caches
train_quality_classifier(feats, "distill_label", iters=2)
t0 = time.time()
model = train_quality_classifier(feats, "distill_label", iters=iters)
sec = time.time() - t0
# throughput = row-gradient evaluations per second (rows × passes,
# counting the moments pass)
passes = iters + 1
print(json.dumps({
    "cores": cores, "rows": rows, "iters": iters, "sec": round(sec, 3),
    "row_grads_per_sec": round(rows * passes / sec, 1),
    "weights": model.weights,  # full repr precision
}))
spark.stop()
"""


def run_level(cores: int, rows: int, iters: int, cache: str) -> dict:
    env = dict(
        os.environ,
        FW_REPO=str(REPO),
        FW_CORES=str(cores),
        FW_ROWS=str(rows),
        FW_ITERS=str(iters),
        FW_CACHE=cache,
    )
    out = subprocess.run(
        [sys.executable, "-c", RUNNER], env=env, capture_output=True,
        text=True, timeout=1800,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"runner failed (cores={cores}):\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    rows = int(os.environ.get("FW_TRAIN_ROWS", "2000000"))
    iters = int(os.environ.get("FW_TRAIN_ITERS", "8"))
    cache = f"/tmp/fw_train_feats_{rows}"
    # interleaved visits: best-per-level cancels minute-scale host drift
    n = run_level(8, rows, iters, cache)
    n4 = run_level(32, rows, iters, cache)
    n_b = run_level(8, rows, iters, cache)
    n4_b = run_level(32, rows, iters, cache)
    identical = all(
        r["weights"] == n["weights"] for r in (n4, n_b, n4_b)
    )
    if n_b["row_grads_per_sec"] > n["row_grads_per_sec"]:
        n = n_b
    if n4_b["row_grads_per_sec"] > n4["row_grads_per_sec"]:
        n4 = n4_b
    eff = round(n4["row_grads_per_sec"] / (4 * n["row_grads_per_sec"]), 3)
    result = {
        "what": "q80 classifier training: full-batch logistic GD, "
                "integer-exact gradient aggregation (operators/training.py)",
        "rows": rows,
        "iters": iters,
        "N": {k: n[k] for k in ("cores", "sec", "row_grads_per_sec")},
        "4N": {k: n4[k] for k in ("cores", "sec", "row_grads_per_sec")},
        "efficiency": eff,
        "weights_bit_identical_across_parallelism": identical,
        "weights": n["weights"],
    }
    (REPO / "BENCH" / "classifier_train.json").write_text(
        json.dumps(result, indent=2) + "\n"
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
