"""Bloom-gated incremental URL dedup: novelty filtering for new crawl dumps.

The exact-dedup scale problem at 10^12 documents is not the hash — it is
the SHUFFLE: an exact anti-join of a new dump against the full seen-URL
corpus shuffles BOTH sides on the url key every time a dump arrives.
The standard production answer (CCNet's per-shard hashes, FineWeb's
per-dump URL dedup, web-crawler frontier filters) is a Bloom filter:
build a compact bit array over the seen set ONCE, broadcast it, and
gate the new dump map-side — zero shuffle on the new dump, a bounded
false-positive rate (never false negatives), and the exact join only
ever runs over the tiny `bloom_hit` survivor slice if exactness is
required.

Engine-portable hash family (mirrors ``operators/dedup.py`` /
``operators/dsir.py``): position_i(url) = int(md5(url || '#' || i)[:8
hex], 16) % m for i in 1..k — every position is reproducible in any
engine with md5 (the q74 DuckDB oracle replays membership bit-for-bit),
and the whole position computation stays JVM-side (``F.md5`` inside
whole-stage codegen); Python only touches the broadcast bit array via
one vectorized numpy lookup.

Scale shape (what must survive 100 TB):

- **build**: positions are computed map-side; each input partition
  folds its positions into a LOCAL m/8-byte bit array inside one
  ``mapInPandas`` pass and emits a single binary row — no shuffle of
  per-url rows at all. Partials are OR-combined either on the driver
  (fine to ~hundreds of partitions) or through an optional one-level
  tree combine (``tree_fanout``) that groups partials into
  ``fanout``-sized buckets with ``applyInPandas`` before the driver
  sees them — the same shape as Spark's ``treeAggregate``.
- **apply**: the filter is ``m/8`` bytes (16 bits/item ≈ 2 bytes/url:
  10^8 seen urls → 200 MB) broadcast once per dump; the new dump is
  filtered in its scan stage with zero exchanges. Beyond ~10^9 seen
  urls per filter, shard the url space by hash and build one filter
  per shard (each new-dump partition consults only its shard's
  filter); this module sizes a single filter and documents the regime
  rather than hiding the cliff.
- **sizing**: ``bloom_m_for`` picks the smallest power-of-two m giving
  ``bits_per_item`` bits per seen url (default 16 → fpp ≈ 0.0013 at
  k=5), the corpus-derived-parameter pattern of
  ``similarity.py:sized_n_planes``; ``bloom_fpp`` reports the
  analytic false-positive rate so callers can log it as lineage.

False positives are DETERMINISTIC for a fixed (m, k, seen-set): the
md5 family has no runtime seed, so a flagged-but-novel url is flagged
on every engine and every run — which is what makes the q74 oracle a
value-level check of the fp accounting, not just of the happy path.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_m_for(n_items: int, bits_per_item: int = 16, min_m: int = 1024) -> int:
    """Smallest power-of-two bit-array size giving ``bits_per_item``
    bits per seen item. Power-of-two keeps the modulo cheap and the
    DuckDB mirror trivial: POWER(2, CEIL(LOG2(bits_per_item * n))).
    (log2 of an exact power of two is exact in IEEE double, so the
    SQL mirror cannot round differently.)"""
    if n_items <= 0:
        return min_m
    return max(min_m, 1 << math.ceil(math.log2(bits_per_item * n_items)))


def bloom_fpp(n_items: int, m: int, k: int) -> float:
    """Analytic false-positive rate (1 - e^{-kn/m})^k — lineage metric."""
    if n_items <= 0:
        return 0.0
    return (1.0 - math.exp(-k * n_items / m)) ** k


def bloom_positions(col: Column, *, k: int, m: int) -> Column:
    """``array<long>`` of the k bit positions for one key, JVM-side.

    position_i = int(first 8 hex chars of md5(key || '#' || i), 16) % m.
    DuckDB mirror (q74): ('0x' || substr(md5(u || '#' || CAST(i AS
    VARCHAR)), 1, 8))::BIGINT % m for i in 1..k. Null keys yield a
    null array (concat null-propagates), which build skips and
    membership surfaces as a null flag."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if m < 8 or m & (m - 1):
        raise ValueError(f"m must be a power of two >= 8, got {m}")
    # without the isNotNull guard a null key yields an array of k null
    # ELEMENTS (transform runs, concat null-propagates per element),
    # which Arrow hands to numpy as NaNs; we want a null ARRAY instead
    arr = _positions_arr(col, k, m)
    return F.when(col.isNotNull(), arr)


def _positions_arr(col: Column, k: int, m: int) -> Column:
    return F.transform(
        F.sequence(F.lit(1), F.lit(int(k))),
        lambda i: F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(col, F.lit("#"), i.cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("long"),
            F.lit(int(m)),
        ),
    )


def _or_partials(rows: list[bytes], m: int) -> bytes:
    acc = np.zeros(m // 8, dtype=np.uint8)
    for b in rows:
        acc |= np.frombuffer(b, dtype=np.uint8)
    return acc.tobytes()


def build_bloom(
    df: DataFrame,
    col: str = "url",
    *,
    m: int,
    k: int = 5,
    tree_fanout: int | None = None,
) -> bytes:
    """Build the m-bit filter over ``df[col]`` — returns m/8 bytes.

    One mapInPandas pass: every partition folds its JVM-computed
    position arrays into a local numpy bit array and emits ONE binary
    row, so nothing per-url ever crosses the network. With
    ``tree_fanout`` the P partial rows are OR-combined in ⌈P/fanout⌉
    groups first (one tiny shuffle of P rows of m/8 bytes) — use it
    when partitions × m/8 would swamp the driver; the default
    driver-side OR is exact and fine at local/benchmark scale."""
    mm = int(m)
    pos_df = df.where(F.col(col).isNotNull()).select(
        bloom_positions(F.col(col), k=k, m=mm).alias("pos")
    )

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(mm // 8, dtype=np.uint8)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in pdf["pos"]]
            )
            np.bitwise_or.at(
                bits, flat >> 3, (np.uint8(1) << (flat & 7).astype(np.uint8))
            )
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    partials = pos_df.mapInPandas(_partial, "bits binary")

    if tree_fanout and tree_fanout > 1:
        fanout = int(tree_fanout)

        def _or_group(pdf: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"bits": [_or_partials(list(pdf["bits"]), mm)]}
            )

        partials = (
            partials.withColumn(
                "g", F.pmod(F.monotonically_increasing_id(), F.lit(fanout))
            )
            .groupBy("g")
            .applyInPandas(_or_group, "bits binary")
        )

    rows = [r.bits for r in partials.collect()]
    return _or_partials(rows, mm)


def with_bloom_hit(
    df: DataFrame,
    bloom_bytes: bytes,
    col: str = "url",
    *,
    k: int = 5,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Flag rows whose key MIGHT be in the filter (never false
    negatives). Positions stay JVM-side; the only Python work is one
    vectorized numpy gather against the broadcast bit array."""
    m = len(bloom_bytes) * 8
    if m < 8 or m & (m - 1):
        raise ValueError(f"filter length must be a power of two bits, got {m}")
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bloom_bytes)
    kk = int(k)

    @F.pandas_udf("boolean")
    def _test(pos: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        out = pd.Series([None] * len(pos), dtype=object)
        mask = pos.notna().to_numpy()
        if mask.any():
            mat = np.stack(
                [np.asarray(a, dtype=np.int64) for a in pos[mask]]
            ).reshape(-1, kk)
            hit = (((bits[mat >> 3] >> (mat & 7)) & 1) == 1).all(axis=1)
            out[mask] = [bool(h) for h in hit]
        return out

    return df.withColumn(out_col, _test(bloom_positions(F.col(col), k=kk, m=m)))


def bloom_gate_new_dump(
    old: DataFrame,
    new: DataFrame,
    col: str = "url",
    *,
    bits_per_item: int = 16,
    k: int = 5,
    m: int | None = None,
    verify_exact: bool = False,
    tree_fanout: int | None = None,
) -> DataFrame:
    """The full incremental gate: size a filter from the seen corpus,
    build it, and flag every new-dump row with ``bloom_hit``.

    Production stops there — ``bloom_hit = false`` rows are PROVABLY
    novel (no false negatives) and flow straight through with zero
    shuffle; the (tiny, fpp-bounded) ``bloom_hit = true`` slice either
    gets dropped (dedup-aggressive) or exact-joined (dedup-exact).
    ``verify_exact=True`` additionally computes ``exact_hit`` /
    ``false_positive`` via a distinct-key join over the seen set —
    that is the EVIDENCE path (q74's oracle checks the fp accounting);
    at scale you would only join the bloom_hit slice.
    """
    n_old = old.where(F.col(col).isNotNull()).count()
    mm = int(m) if m else bloom_m_for(n_old, bits_per_item)
    filt = build_bloom(old, col, m=mm, k=k, tree_fanout=tree_fanout)
    out = with_bloom_hit(new, filt, col, k=k)
    if verify_exact:
        seen = old.select(F.col(col).alias("__seen_key")).distinct()
        out = (
            out.join(
                seen, out[col].eqNullSafe(F.col("__seen_key")), "left"
            )
            .withColumn("exact_hit", F.col("__seen_key").isNotNull())
            .drop("__seen_key")
            .withColumn(
                "false_positive", F.col("bloom_hit") & ~F.col("exact_hit")
            )
        )
    return out
