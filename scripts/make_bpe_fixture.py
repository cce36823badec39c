#!/usr/bin/env python
"""Train the committed BPE merge table and generate the q75 oracle fixture.

Training (functions/bpe.py:train_bpe, Sennrich-style with deterministic
lexicographic tie-breaks) runs on the sf0.001 corpus word frequencies and
writes ``artifacts/bpe_merges.txt`` + ``artifacts/bpe_vocab.txt``. Then
every distinct text across the SF dirs is encoded with the SAME pure
functions the Spark UDF uses, producing ``artifacts/bpe_tokens.parquet``
(md5(text) → n_tokens, checksum) — the zlib-ratio oracle pattern: the
DuckDB side of q75 joins this fixture instead of re-running the (not
SQL-expressible) merge loop, so the oracle can never drift from the
engine's semantics without this script being re-run.

Usage: python scripts/make_bpe_fixture.py [n_merges]
"""

from __future__ import annotations

import hashlib
import sys
from collections import Counter
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from fineweb_domain_analyzer_spark.functions.bpe import (  # noqa: E402
    MERGES_PATH,
    VOCAB_PATH,
    build_vocab,
    encode_text,
    pretokenize,
    train_bpe,
)

FIXTURE = REPO / "fineweb_domain_analyzer_spark" / "artifacts" / "bpe_tokens.parquet"
TRAIN_SF = "/root/testdata/sf0.001"
ALL_SF = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def distinct_texts(sf_dir: str) -> list[str]:
    return [
        t
        for (t,) in duckdb.sql(
            f"SELECT DISTINCT text FROM read_parquet('{sf_dir}/documents.parquet') "
            "WHERE text IS NOT NULL"
        ).fetchall()
    ]


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 256

    freqs: Counter[str] = Counter()
    for t in distinct_texts(TRAIN_SF):
        freqs.update(pretokenize(t))
    print(f"training: {sum(freqs.values())} tokens, {len(freqs)} types")

    merges = train_bpe(dict(freqs), n_merges)
    vocab = build_vocab(dict(freqs), merges)
    MERGES_PATH.write_text(
        "\n".join(f"{a}\t{b}" for a, b in merges) + "\n", encoding="utf-8"
    )
    VOCAB_PATH.write_text("\n".join(vocab) + "\n", encoding="utf-8")
    print(f"wrote {len(merges)} merges, {len(vocab)} vocab entries")

    ranks = {p: i for i, p in enumerate(merges)}
    ids = {tok: i for i, tok in enumerate(vocab)}
    cache: dict = {}
    seen: dict[str, tuple[int, int]] = {}
    for d in ALL_SF:
        for t in distinct_texts(d):
            h = hashlib.md5(t.encode("utf-8")).hexdigest()
            if h not in seen:
                seen[h] = encode_text(t, ranks, ids, cache)
        print(f"{d}: cumulative {len(seen)} distinct texts")

    table = pa.table(
        {
            "text_md5": list(seen.keys()),
            "bpe_n_tokens": pa.array(
                [v[0] for v in seen.values()], type=pa.int64()
            ),
            "bpe_checksum": pa.array(
                [v[1] for v in seen.values()], type=pa.int64()
            ),
        }
    )
    pq.write_table(table, FIXTURE)
    print(f"wrote {FIXTURE} ({table.num_rows} rows)")


if __name__ == "__main__":
    main()
