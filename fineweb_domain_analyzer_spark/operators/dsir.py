"""DSIR-style data selection: hashed n-gram importance weighting.

Public method (Xie et al., "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023): featurize every document as
hashed n-gram counts over ``n_buckets`` buckets, fit bag-of-hashed-
ngrams unigram models on a TARGET corpus (the distribution you want
more of — curated text, a trusted domain) and on the RAW corpus, and
weight each raw document by the log-likelihood ratio

    log w(x) = sum_b  c_b(x) * ( log p_target(b) - log p_raw(b) )

with add-lambda smoothing. Selecting the top fraction by weight tilts
the kept corpus toward the target distribution; it is the standard
pretraining-data-selection baseline the FineWeb/DataComp lineage
benchmarks against.

Engine-portable by construction, mirroring the repo's md5 hash family
(``operators/dedup.py``): tokens are whitespace splits of
trim(lower(text)) — the exact q23 tokenizer — grams hash through
``md5 → first 8 hex chars → int % n_buckets``, and every per-bucket
log-ratio is quantized to INTEGER micro-nats before the per-document
sum, so the document weight is an exact bigint: summation order (and
therefore partitioning) cannot change it, and DuckDB reproduces it
bit-for-bit (q72 oracle).

Scale shape (the part that must survive 100 TB):
- the gram explode is map-side; per-document bucket counts are ONE
  (id, bucket)-keyed shuffle with map-side partial aggregation;
- both bucket models are <= n_buckets rows (thousands), built by tiny
  aggregates and BROADCAST into the scoring join — the corpus never
  shuffles against the model;
- the per-document weight is one id-keyed aggregate (second shuffle);
- selection reuses ``keep_top_pct_by_group``'s banded kernel, so the
  top-fraction cut never sorts the corpus in one task.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _grams(text, *, bigrams: bool = True):
    """Unigram (+ bigram) array of trim(lower(text)) whitespace tokens.
    Matches DuckDB: string_split_regex(trim(lower(text)), '\\s+') and
    list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    if not bigrams:
        return toks
    bi = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bi)


def _bucket(gram, n_buckets: int):
    """md5-family hash bucket: first 8 hex chars as an int, mod B.
    DuckDB mirror: ('0x' || substr(md5(g), 1, 8))::BIGINT % B."""
    return F.pmod(
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long"),
        F.lit(int(n_buckets)),
    )


def hashed_ngram_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    bigrams: bool = True,
) -> DataFrame:
    """(id, bucket, cnt) hashed n-gram counts per document — the DSIR
    feature map. Null text explodes to zero rows (the caller's join
    back to the corpus decides the null policy). One shuffle, keyed
    (id, bucket), with map-side partial counts."""
    return (
        df.select(F.col(id_col), F.explode(_grams(F.col(text_col), bigrams=bigrams)).alias("_g"))
        .select(id_col, _bucket(F.col("_g"), n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_bucket_llr(
    raw_counts: DataFrame,
    target_counts: DataFrame,
    n_buckets: int = 4096,
    smoothing: float = 1.0,
) -> DataFrame:
    """(bucket, llr_micro) — per-bucket log p_target(b) - log p_raw(b)
    under add-``smoothing`` models, quantized to bigint micro-nats
    (round(1e6 * llr)). Inputs are (.., bucket, cnt) frames (any extra
    columns ignored); each side is first rolled up to <= n_buckets
    rows, so everything here is tiny-side work.

    Buckets unseen on BOTH sides still get a (well-defined) smoothed
    llr — but they can never be referenced by a document, so the table
    only materializes buckets observed on at least one side."""
    lam = float(smoothing)
    if lam <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    b = int(n_buckets)
    raw_b = raw_counts.groupBy("bucket").agg(F.sum("cnt").alias("_rc"))
    tgt_b = target_counts.groupBy("bucket").agg(F.sum("cnt").alias("_tc"))
    totals = raw_b.agg(F.sum("_rc").alias("_rtot")).crossJoin(
        tgt_b.agg(F.sum("_tc").alias("_ttot"))
    )
    merged = (
        raw_b.join(tgt_b, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("_rc", F.lit(0)).alias("_rc"),
            F.coalesce("_tc", F.lit(0)).alias("_tc"),
        )
        .crossJoin(F.broadcast(totals))
    )
    llr = F.log(
        (F.col("_tc") + F.lit(lam)) / (F.coalesce(F.col("_ttot"), F.lit(0)) + F.lit(lam * b))
    ) - F.log(
        (F.col("_rc") + F.lit(lam)) / (F.coalesce(F.col("_rtot"), F.lit(0)) + F.lit(lam * b))
    )
    return merged.select(
        "bucket", F.round(llr * F.lit(1_000_000.0), 0).cast("long").alias("llr_micro")
    )


def dsir_logweight(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    smoothing: float = 1.0,
    bigrams: bool = True,
    out_col: str = "dsir_weight_micro",
) -> DataFrame:
    """docs + ``out_col``: the exact-integer DSIR importance weight in
    micro-nats (sum over the doc's buckets of cnt * llr_micro).
    Documents with no grams (null text) weigh 0. The raw model is fit
    on ``docs`` itself; pass a pre-aggregated sample through
    ``dsir_bucket_llr`` directly if the raw fit should use a sample.

    Lineage note (same policy as ``keep_top_pct_by_group``): the gram
    counts feed both the model aggregate and the scoring join, so
    unmaterialized upstream lineage executes more than once — persist
    the input (or the counts) when it is expensive."""
    counts = hashed_ngram_counts(docs, id_col, text_col, n_buckets, bigrams)
    tcounts = hashed_ngram_counts(target, id_col, text_col, n_buckets, bigrams)
    llr = dsir_bucket_llr(counts, tcounts, n_buckets, smoothing)
    weights = (
        counts.join(F.broadcast(llr), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("llr_micro")).alias(out_col))
    )
    return docs.join(weights, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(0).cast("long"))
    )


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    pct: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    smoothing: float = 1.0,
    banded: bool = True,
    weight_col: str = "dsir_weight_micro",
) -> DataFrame:
    """Keep the top ``pct`` percent of ``docs`` by DSIR weight —
    rank-exact ((score desc, id) order, integer threshold), via the
    banded global cut so no single task sorts the corpus."""
    from fineweb_domain_analyzer_spark.operators.quality import (
        keep_top_pct_by_group,
    )

    weighted = dsir_logweight(
        docs, target, id_col, text_col, n_buckets, smoothing, out_col=weight_col
    )
    kept = keep_top_pct_by_group(
        weighted.withColumn("_dsir_g", F.lit(1)),
        pct,
        score_col=weight_col,
        by_col="_dsir_g",
        id_col=id_col,
        banded=banded,
    )
    return kept.drop("_dsir_g")


def expected_weight_py(
    texts_by_id: dict,
    target_texts: list,
    n_buckets: int = 4096,
    smoothing: float = 1.0,
    bigrams: bool = True,
) -> dict:
    """Pure-Python differential oracle for tests: recomputes the exact
    micro-nat weights with hashlib + math.log over tiny corpora."""
    import hashlib
    from collections import Counter

    def grams(text):
        if text is None:
            return []
        # strip SPACES only — Spark F.trim / DuckDB trim do not touch
        # \n or \t, and the tokenizer must agree byte-for-byte
        toks = __import__("re").split(r"\s+", text.strip(" ").lower())
        out = list(toks)
        if bigrams:
            out += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return out

    def bucket(g):
        return int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16) % n_buckets

    raw = Counter()
    per_doc: dict = {}
    for i, t in texts_by_id.items():
        c = Counter(bucket(g) for g in grams(t))
        per_doc[i] = c
        raw.update(c)
    tgt = Counter()
    for t in target_texts:
        tgt.update(bucket(g) for g in grams(t))
    rtot, ttot = sum(raw.values()), sum(tgt.values())
    lam = smoothing

    def llr_micro(b):
        num = math.log((tgt.get(b, 0) + lam) / (ttot + lam * n_buckets))
        den = math.log((raw.get(b, 0) + lam) / (rtot + lam * n_buckets))
        # round-half-away-from-zero, matching Spark/DuckDB round()
        x = (num - den) * 1_000_000.0
        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    return {
        i: sum(c * llr_micro(b) for b, c in cnts.items())
        for i, cnts in per_doc.items()
    }
