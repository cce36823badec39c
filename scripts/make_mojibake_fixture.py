#!/usr/bin/env python
"""Generate the mojibake-repair oracle fixture.

q111 repairs deterministically-corrupted text with the Arrow UDF over
``functions/textfns.py:fix_mojibake_text`` (encode/decode round-trips
are not SQL-expressible), so the DuckDB oracle joins
``artifacts/mojibake.parquet`` on ``md5(text)``. The fixture is derived
from the test corpus with the EXACT package functions (imported, not
re-implemented), so oracle and engine can never drift without this
being regenerated.

Per distinct corpus text t:
    pre       = t.replace("the", "thé")      (accent injection — the
                corpus is pure ASCII, mirrored as SQL replace())
    corrupted = corrupt_utf8_as_latin1(pre)
    fixed     = fix_mojibake_text(corrupted)

Columns: text_md5, pre_md5, corrupted_fixed_md5,
         corrupted_detected (fixed != corrupted),
         corrupted_restored (fixed == pre).

Usage: python scripts/make_mojibake_fixture.py [sf_dir ...]
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from fineweb_domain_analyzer_spark.functions.textfns import (  # noqa: E402
    corrupt_utf8_as_latin1,
    fix_mojibake_text,
)

OUT = REPO / "fineweb_domain_analyzer_spark" / "artifacts" / "mojibake.parquet"
DEFAULT_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def main() -> None:
    sf_dirs = sys.argv[1:] or DEFAULT_SF_DIRS
    seen: dict[str, tuple] = {}
    n_detected = n_restored = 0
    for d in sf_dirs:
        rows = duckdb.sql(
            f"SELECT DISTINCT text FROM read_parquet('{d}/documents.parquet') "
            "WHERE text IS NOT NULL"
        ).fetchall()
        for (text,) in rows:
            h = md5(text)
            if h in seen:
                continue
            pre = text.replace("the", "thé")
            corrupted = corrupt_utf8_as_latin1(pre)
            fixed = fix_mojibake_text(corrupted)
            seen[h] = (
                h,
                md5(pre),
                md5(fixed),
                fixed != corrupted,
                fixed == pre,
            )
            n_detected += fixed != corrupted
            n_restored += fixed == pre
        print(f"{d}: {len(rows)} distinct texts (cumulative {len(seen)})")
    cols = list(zip(*seen.values()))
    table = pa.table(
        {
            "text_md5": list(cols[0]),
            "pre_md5": list(cols[1]),
            "corrupted_fixed_md5": list(cols[2]),
            "corrupted_detected": list(cols[3]),
            "corrupted_restored": list(cols[4]),
        }
    )
    pq.write_table(table, OUT)
    print(
        f"wrote {OUT}: {table.num_rows} rows, "
        f"{n_detected} detected, {n_restored} fully restored"
    )


if __name__ == "__main__":
    main()
