#!/usr/bin/env python
"""Generate the zlib compression-ratio oracle fixture.

The q13 quality-surface / q58 compression-ratio signal is computed by an
Arrow-batched pandas UDF (zlib is not SQL-expressible), so the DuckDB
oracle joins ``artifacts/zlib_ratio.parquet`` on ``md5(text)`` instead of
recomputing.  This script derives the fixture *from the test corpus
itself* with the exact same python-zlib call the UDF makes
(``round(len(zlib.compress(utf8, 6)) / len(raw), 4)``, empty -> 1.0), so
the oracle can never drift from the engine's semantics without this
fixture being regenerated.

Deterministic: zlib output is fixed for a given input + level within a
zlib version, and the testdata parquet is driver-frozen.

Usage: python scripts/make_zlib_fixture.py [sf_dir ...]
"""

from __future__ import annotations

import hashlib
import sys
import zlib
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "fineweb_domain_analyzer_spark" / "artifacts" / "zlib_ratio.parquet"
DEFAULT_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def ratio(s: str) -> float:
    raw = s.encode("utf-8", "ignore")
    if not raw:
        return 1.0
    return round(len(zlib.compress(raw, 6)) / len(raw), 4)


def main() -> None:
    sf_dirs = sys.argv[1:] or DEFAULT_SF_DIRS
    seen: dict[str, float] = {}
    for d in sf_dirs:
        rows = duckdb.sql(
            f"SELECT DISTINCT text FROM read_parquet('{d}/documents.parquet') "
            "WHERE text IS NOT NULL"
        ).fetchall()
        for (text,) in rows:
            h = hashlib.md5(text.encode("utf-8")).hexdigest()
            if h not in seen:
                seen[h] = ratio(text)
        print(f"{d}: {len(rows)} distinct texts (cumulative {len(seen)})")
    table = pa.table(
        {
            "text_md5": pa.array(sorted(seen), pa.string()),
            "compression_ratio": pa.array(
                [seen[h] for h in sorted(seen)], pa.float64()
            ),
        }
    )
    pq.write_table(table, OUT)
    print(f"wrote {OUT} ({len(seen)} rows)")


if __name__ == "__main__":
    main()
