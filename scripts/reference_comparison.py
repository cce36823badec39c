#!/usr/bin/env python
"""Head-to-head vs the reference implementation on the SAME input:
run /root/reference/fineweb_analyzer.py --filter-content (single-node,
pure Python) and this engine's CLI --filter-content (Spark local) over
an identical synthetic JSONL + robots snapshot, assert the keep/drop
partitions agree line-for-line, and record both throughputs in
BENCH/reference_comparison.json.

The reference binary is EXECUTED, never copied — it is the baseline
the BASELINE.json metric says we must match (labels) and beat
(throughput).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REF = os.environ.get("FW_REFERENCE", "/root/reference/fineweb_analyzer.py")
ROWS = int(os.environ.get("FW_COMPARE_ROWS", "3000000"))
WORK = Path(os.environ.get("FW_COMPARE_DIR", "/tmp/fw_refcmp"))


def build_inputs() -> tuple[Path, Path]:
    """Synthesize pages.jsonl + robots_check.json once (cached)."""
    from pyspark.sql import functions as F

    from fineweb_domain_analyzer_spark.session import get_spark
    from fineweb_domain_analyzer_spark.sources.pages import synth_pages

    jsonl = WORK / f"pages_{ROWS}.jsonl"
    robots = WORK / "robots_check.json"
    if jsonl.exists() and robots.exists():
        return jsonl, robots
    WORK.mkdir(parents=True, exist_ok=True)
    spark = get_spark(
        master="local[32]",
        extra_confs={"spark.ui.enabled": "false", "spark.ui.showConsoleProgress": "false"},
    )
    pages = synth_pages(spark, ROWS, n_domains=2000, seed=42).select(
        F.to_json(F.struct(F.col("url"), F.coalesce(F.col("text"), F.lit("")).alias("text"))).alias("line")
    )
    tmp = str(jsonl) + "_spark"
    pages.coalesce(1).write.mode("overwrite").text(tmp)
    os.replace(glob.glob(os.path.join(tmp, "part-*"))[0], jsonl)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    # policy snapshot in the reference's robots_check format: every 2nd
    # host covered, covered hosts with i % 7 == 0 denied (matches
    # synth_policy_for_domains deny_every=7)
    results = {}
    for i in range(0, 2000, 2):
        d = f"host{i}.example.com"
        results[d] = {
            "domain": d,
            "robots_exists": True,
            "crawl_allowed": not (i % 7 == 0),
            "crawl_delay": None,
            "disallowed_paths": [],
            "error": None,
            "last_checked": "2025-07-24T13:32:14",
        }
    robots.write_text(
        json.dumps({"metadata": {"generated_at": "2025-07-24"}, "results": results})
    )
    spark.stop()
    return jsonl, robots


def read_lines(pattern: str) -> list[str]:
    out = []
    for p in sorted(glob.glob(pattern)):
        with open(p, encoding="utf-8") as f:
            out += [l.rstrip("\n") for l in f if l.strip()]
    return out


def run_reference(jsonl: Path, robots: Path) -> dict:
    import shutil

    out = WORK / "ref_out"
    shutil.rmtree(out, ignore_errors=True)  # timestamped names accumulate
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, REF, "--input", str(jsonl), "--robots", str(robots),
         "--filter-content", "--output", str(out)],
        capture_output=True, text=True, timeout=3600,
    )
    sec = time.time() - t0
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return {"sec": round(sec, 3), "docs_per_sec": round(ROWS / sec, 1), "out": str(out)}


def run_engine_cli(jsonl: Path, robots: Path) -> dict:
    """Worst case: fresh JVM per query + partitioned parallel sink."""
    import shutil

    out = WORK / "spark_out"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "fineweb_domain_analyzer_spark.cli",
         "--input", str(jsonl), "--robots", str(robots), "--filter-content",
         "--partitioned-output",
         "--output", str(out), "--run-ts", "20250724_000000",
         "--master", "local[32]"],
        capture_output=True, text=True, timeout=3600, cwd=str(REPO),
    )
    sec = time.time() - t0
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return {"sec": round(sec, 3), "docs_per_sec": round(ROWS / sec, 1), "out": str(out)}


def run_engine_inprocess(jsonl: Path, robots: Path) -> dict:
    """Steady state: session already up (how a real job runs many
    inputs); full read -> label -> partitioned write -> stats."""
    from fineweb_domain_analyzer_spark.functions.robots import load_policy_fixture
    from fineweb_domain_analyzer_spark.operators.filtering import label_pages
    from fineweb_domain_analyzer_spark.operators.metrics import filter_stats
    from fineweb_domain_analyzer_spark.session import get_spark
    from fineweb_domain_analyzer_spark.sources.jsonl import (
        read_jsonl_with_raw,
        write_jsonl_passthrough,
    )

    import shutil

    out = WORK / "spark_inproc_out"
    shutil.rmtree(out, ignore_errors=True)
    spark = get_spark(
        master="local[32]",
        extra_confs={"spark.ui.enabled": "false", "spark.ui.showConsoleProgress": "false"},
    )
    # warm-up on a tiny slice (Janino + python workers), then measure
    policy = load_policy_fixture(spark, str(robots))
    warm = read_jsonl_with_raw(spark, str(jsonl)).limit(1000)
    filter_stats(label_pages(warm, policy)).collect()
    t0 = time.time()
    labeled = label_pages(read_jsonl_with_raw(spark, str(jsonl)), policy)
    write_jsonl_passthrough(labeled, str(out))
    stats = filter_stats(labeled).collect()[0]
    sec = time.time() - t0
    assert stats["total_processed"] == ROWS
    spark.stop()
    return {"sec": round(sec, 3), "docs_per_sec": round(ROWS / sec, 1), "out": str(out)}


def run_reference_domains(jsonl: Path) -> dict:
    """Stage-2 head-to-head: the reference's --extract-domains."""
    import shutil

    out = WORK / "ref_dom_out"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, REF, "--input", str(jsonl), "--extract-domains",
         "--output", str(out)],
        capture_output=True, text=True, timeout=3600,
    )
    sec = time.time() - t0
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    detailed = json.loads(open(glob.glob(f"{out}/domains_detailed_*.json")[0]).read())
    return {"sec": round(sec, 3), "docs_per_sec": round(ROWS / sec, 1),
            "domains": detailed["domains"]}


def run_engine_domains(jsonl: Path) -> dict:
    """Stage-2 on a warm session (steady state)."""
    from pyspark.sql import functions as F

    from fineweb_domain_analyzer_spark.operators.domain_stats import domain_stats
    from fineweb_domain_analyzer_spark.operators.filtering import with_domain
    from fineweb_domain_analyzer_spark.session import get_spark
    from fineweb_domain_analyzer_spark.sources.jsonl import read_jsonl_with_raw

    spark = get_spark(
        master="local[32]",
        extra_confs={"spark.ui.enabled": "false", "spark.ui.showConsoleProgress": "false"},
    )
    pages_w = with_domain(
        read_jsonl_with_raw(spark, str(jsonl)).limit(1000).filter(
            F.col("url").isNotNull() & (F.col("url") != "")
        )
    )
    domain_stats(pages_w, order_col="url", run_ts="warm").collect()  # warm-up
    t0 = time.time()
    pages = with_domain(
        read_jsonl_with_raw(spark, str(jsonl)).filter(
            F.col("url").isNotNull() & (F.col("url") != "")
        )
    )
    rows = domain_stats(pages, order_col="url", run_ts="2025-07-24T00:00:00").collect()
    sec = time.time() - t0
    spark.stop()
    return {"sec": round(sec, 3), "docs_per_sec": round(ROWS / sec, 1),
            "domains": {r["domain"]: {"count": r["count"]} for r in rows}}


def _best(a: dict, b: dict) -> dict:
    """Min-time of two interleaved visits (outputs are identical)."""
    return a if a["sec"] <= b["sec"] else b


def main() -> None:
    jsonl, robots = build_inputs()
    # Interleaved A/B/A/B visits per leg: sandbox Spark throughput
    # swings >2x on a minutes timescale (verified: the identical
    # commit measured 38 s and 93 s on this leg within one hour, with
    # the pure-python reference steady throughout), so measuring each
    # leg once attributes host drift to the engine axis. Best-of-2
    # visits per leg; outputs are byte-compared from the last visit.
    ref = run_reference(jsonl, robots)
    eng = run_engine_cli(jsonl, robots)
    inproc = run_engine_inprocess(jsonl, robots)
    ref = _best(ref, run_reference(jsonl, robots))
    eng = _best(eng, run_engine_cli(jsonl, robots))
    inproc = _best(inproc, run_engine_inprocess(jsonl, robots))
    ref_dom = run_reference_domains(jsonl)
    eng_dom = run_engine_domains(jsonl)
    ref_dom = _best(ref_dom, run_reference_domains(jsonl))
    eng_dom = _best(eng_dom, run_engine_domains(jsonl))
    dom_counts_match = {
        d: v["count"] for d, v in ref_dom["domains"].items()
    } == {d: v["count"] for d, v in eng_dom["domains"].items()}
    ref_kept = read_lines(f"{ref['out']}/filtered_*.jsonl")
    ref_excl = read_lines(f"{ref['out']}/excluded_*.jsonl")
    eng_kept = read_lines(f"{eng['out']}/filtered_*.jsonl/*.txt")
    eng_excl = read_lines(f"{eng['out']}/excluded_*.jsonl/*.txt")
    ip_kept = read_lines(f"{inproc['out']}/keep=true/*.txt")
    ip_excl = read_lines(f"{inproc['out']}/keep=false/*.txt")
    labels_match = (
        sorted(ref_kept) == sorted(eng_kept) == sorted(ip_kept)
        and sorted(ref_excl) == sorted(eng_excl) == sorted(ip_excl)
    )
    result = {
        "rows": ROWS,
        "reference_single_node": {k: ref[k] for k in ("sec", "docs_per_sec")},
        "engine_cli_fresh_jvm": {k: eng[k] for k in ("sec", "docs_per_sec")},
        "engine_steady_state": {k: inproc[k] for k in ("sec", "docs_per_sec")},
        "speedup_incl_jvm_startup": round(ref["sec"] / eng["sec"], 2),
        "speedup_steady_state": round(ref["sec"] / inproc["sec"], 2),
        "extract_domains": {
            "reference": {k: ref_dom[k] for k in ("sec", "docs_per_sec")},
            "engine_steady_state": {k: eng_dom[k] for k in ("sec", "docs_per_sec")},
            "speedup_steady_state": round(ref_dom["sec"] / eng_dom["sec"], 2),
            "per_domain_counts_match": dom_counts_match,
        },
        "kept": len(eng_kept),
        "excluded": len(eng_excl),
        "labels_and_lines_byte_identical": labels_match,
        "note": (
            "identical JSONL + robots snapshot; the reference is the exact "
            "committed script at /root/reference, executed unmodified. "
            "engine_cli_fresh_jvm pays full JVM/session startup per query; "
            "engine_steady_state is a warm session (how a long-running job "
            "amortizes it), both with the partitioned parallel sink."
        ),
    }
    assert labels_match, "keep/drop partitions diverge from the reference!"
    assert dom_counts_match, "per-domain counts diverge from the reference!"
    (REPO / "BENCH" / "reference_comparison.json").write_text(
        json.dumps(result, indent=2) + "\n"
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
