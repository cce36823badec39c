#!/usr/bin/env python
"""Micro-bench of the exact-domain batch kernel: per-row urlparse loop
(the old UDF body, still the oracle/fallback) vs the pyarrow.compute
fast path (`extract_domain_vec`), on a CC-shaped URL mix.

No Spark session — this isolates the Python-worker cost the flagship
pipeline pays per Arrow batch. Writes BENCH/domain_udf.json.

Corpus shape: mostly well-formed http(s) URLs (the fast-path subset)
with a configurable fraction of fallback-shaped rows (non-ASCII hosts,
embedded tabs, bracketed IPv6, scheme-less) so the blended number
reflects a realistic mix, not the best case.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import pandas as pd

from fineweb_domain_analyzer_spark.functions.domains import (
    extract_domain_py,
    extract_domain_vec,
)

REPO = Path(__file__).resolve().parent.parent
N = 1_000_000
FALLBACK_EVERY = 500  # 0.2% odd rows — generous vs real CC frequency

FALLBACK_SHAPES = [
    "http://ho\tst.com/x",
    "http://пример.рф/x",
    "http://[2001:db8::1]:8080/x",
    "//host.com/x",
    " http://lead.example.com/x",
]


def build_urls(n: int) -> pd.Series:
    urls = [
        f"http{'s' if i % 2 else ''}://{'www.' if i % 3 == 0 else ''}"
        f"site{i % 50000}.example{i % 7}.com"
        f"{':8080' if i % 97 == 0 else (':443' if i % 89 == 0 else '')}"
        f"/path/{i}?q={i}"
        for i in range(n)
    ]
    for j in range(0, n, FALLBACK_EVERY):
        urls[j] = FALLBACK_SHAPES[(j // FALLBACK_EVERY) % len(FALLBACK_SHAPES)]
    return pd.Series(urls, dtype=object)


def best_of(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t = time.time()
        fn()
        best = min(best, time.time() - t)
    return best


def main() -> None:
    urls = build_urls(N)
    # correctness first: byte-identical on this corpus
    ref = urls.map(extract_domain_py)
    got = extract_domain_vec(urls)
    mismatches = int((ref.fillna("\x00") != got.fillna("\x00")).sum())
    assert mismatches == 0, f"{mismatches} mismatches"

    t_loop = best_of(lambda: urls.map(extract_domain_py))
    t_vec = best_of(lambda: extract_domain_vec(urls))
    out = {
        "question": "per-Arrow-batch cost of exact domain extraction",
        "rows": N,
        "fallback_row_fraction": 1 / FALLBACK_EVERY,
        "urlparse_loop_sec": round(t_loop, 3),
        "urlparse_loop_rows_per_sec": round(N / t_loop),
        "vectorized_sec": round(t_vec, 3),
        "vectorized_rows_per_sec": round(N / t_vec),
        "speedup": round(t_loop / t_vec, 2),
        "mismatches": mismatches,
        "note": (
            "single-threaded, no Spark; the flagship pipeline pays this "
            "inside each Python worker per Arrow batch. Fast path claims "
            "only provably-urlparse-equivalent rows; the rest take the "
            "per-row oracle (0.2% here)."
        ),
    }
    (REPO / "BENCH" / "domain_udf.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
