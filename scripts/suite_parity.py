#!/usr/bin/env python
"""Per-query interleaved suite comparison vs a baseline commit.

ab_bench.py records only suite totals; when a totals-level delta shows
up, this is the localization instrument: alternating baseline/head
suite-only runs (fresh JVM each, BENCH_SUITE_REPS medians per query,
pipeline shrunk to 1000 rows so the suite dominates), per-query medians
across visits compared directly. A genuine code regression shows up as
specific queries consistently slower; co-tenant host drift shows up as
whole visits uniformly slower on whichever side hit a busy minute.

Usage: python scripts/suite_parity.py [baseline_commit] [visits_per_side]
Writes BENCH/suite_parity.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORKTREE = Path("/tmp/suite_parity_baseline")


def run_suite(cwd: Path) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=SF,
        PYTHONPATH=str(cwd),
        BENCH_SUITE_REPS="5",
        BENCH_PIPELINE_ROWS="1000",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=cwd, env=env,
        capture_output=True, text=True, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)["queries"]


def main() -> None:
    baseline = sys.argv[1] if len(sys.argv) > 1 else "HEAD~1"
    visits = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    subprocess.run(
        ["git", "worktree", "remove", "--force", str(WORKTREE)],
        cwd=REPO, capture_output=True,
    )
    subprocess.run(
        ["git", "worktree", "add", "--detach", str(WORKTREE), baseline],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        runs: list[dict] = []
        for v in range(visits):
            order = [("baseline", WORKTREE), ("head", REPO)]
            if v % 2:
                order.reverse()
            for side, cwd in order:
                qs = run_suite(cwd)
                runs.append({"side": side, "queries": qs, "sum": round(sum(qs.values()), 3)})
                print(f"visit {v} {side}: sum={runs[-1]['sum']}", flush=True)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", str(WORKTREE)],
            cwd=REPO, capture_output=True,
        )
    per_query: dict[str, dict] = {}
    names = runs[0]["queries"].keys()
    for name in names:
        med = {
            side: round(
                statistics.median(
                    r["queries"][name] for r in runs if r["side"] == side
                ),
                3,
            )
            for side in ("baseline", "head")
        }
        med["head_over_baseline"] = round(
            med["head"] / med["baseline"], 3
        ) if med["baseline"] else None
        per_query[name] = med
    result = {
        "question": f"per-query suite parity vs {baseline}",
        "method": (
            "alternating baseline/head suite-only runs (fresh JVM each, "
            "BENCH_SUITE_REPS=5 medians, pipeline shrunk to 1000 rows), "
            "per-query medians across visits"
        ),
        "sf_dir": SF,
        "baseline_commit": baseline,
        "runs": runs,
        "per_query_median": per_query,
    }
    out = REPO / "BENCH" / "suite_parity.json"
    out.write_text(json.dumps(result, indent=2) + "\n", encoding="utf-8")
    print(json.dumps(per_query, indent=1))


if __name__ == "__main__":
    main()
