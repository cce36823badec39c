#!/usr/bin/env python
"""Interleaved A/B of bench.py between two commits, in fresh JVMs.

Motivation (VERDICT r2): the driver's BENCH_r02.json was uniformly
~1.5-6x slower than BENCH_r01.json across EVERY query, including plans
untouched between rounds — the signature of host-condition drift, not a
code regression (this sandbox's throughput is documented to swing ~2x
over hours). Cross-session bench numbers are therefore not comparable;
only an interleaved same-session A/B is. This script is that evidence:
it alternates full bench.py runs (each a fresh JVM) between a baseline
commit (checked out into a throwaway git worktree) and the current
working tree, and records per-run and median numbers side by side.

Usage: python scripts/ab_bench.py [baseline_commit] [rounds]
Writes BENCH/ab_bench.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORKTREE = Path("/tmp/ab_bench_baseline")


def run_bench(cwd: Path) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF, PYTHONPATH=str(cwd))
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in reversed(out.stdout.splitlines()):
        line = line.strip()
        if line.startswith('{"metric"'):
            return json.loads(line)
    raise RuntimeError(
        f"no bench JSON from {cwd}: {out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    baseline = sys.argv[1] if len(sys.argv) > 1 else "01fc99b"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    subprocess.run(
        ["git", "worktree", "remove", "--force", str(WORKTREE)],
        cwd=REPO,
        capture_output=True,
    )
    subprocess.run(
        ["git", "worktree", "add", "--detach", str(WORKTREE), baseline],
        cwd=REPO,
        check=True,
        capture_output=True,
        text=True,
    )
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout.strip()

    runs: dict[str, list[dict]] = {"baseline": [], "head": []}
    try:
        for i in range(rounds):
            # alternate A/B within each round so slow-drift affects both;
            # flip the order each round so neither side always pays the
            # warmer/colder slot
            order = (("baseline", WORKTREE), ("head", REPO))
            if i % 2:
                order = order[::-1]
            for side, cwd in order:
                t0 = time.time()
                r = run_bench(cwd)
                runs[side].append(
                    {
                        "suite_sec": r["value"],
                        "pipeline_docs_per_sec": r["pipeline"]["docs_per_sec"],
                        "write_sec": r["pipeline"].get("write_sec"),
                        "wall_sec": round(time.time() - t0, 1),
                    }
                )
                print(f"round {i} {side}: {runs[side][-1]}", flush=True)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", str(WORKTREE)],
            cwd=REPO,
            capture_output=True,
        )

    def med(side: str, key: str) -> float:
        return round(statistics.median(r[key] for r in runs[side]), 2)

    result = {
        "baseline_commit": baseline,
        "head_commit": head,
        "sf_dir": SF,
        "rounds": rounds,
        "interleaved": True,
        "runs": runs,
        "median": {
            side: {
                k: med(side, k)
                for k in ("suite_sec", "pipeline_docs_per_sec", "write_sec")
            }
            for side in ("baseline", "head")
        },
        "head_over_baseline": {
            "suite_speedup": round(
                med("baseline", "suite_sec") / med("head", "suite_sec"), 3
            ),
            "pipeline_speedup": round(
                med("head", "pipeline_docs_per_sec")
                / med("baseline", "pipeline_docs_per_sec"),
                3,
            ),
            "write_speedup": round(
                med("baseline", "write_sec") / med("head", "write_sec"), 3
            ),
        },
        "note": (
            "Each run is a fresh JVM via bench.py; sides alternate within "
            "each round, so host-condition drift hits both equally. "
            "Cross-session artifacts (BENCH_r01 vs BENCH_r02) are NOT "
            "comparable on this host."
        ),
    }
    out = REPO / "BENCH" / "ab_bench.json"
    out.write_text(json.dumps(result, indent=2) + "\n", encoding="utf-8")
    print(json.dumps(result["median"]) + "\n" + json.dumps(result["head_over_baseline"]))


if __name__ == "__main__":
    main()
