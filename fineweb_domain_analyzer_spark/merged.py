"""Consolidated driver-contract registry.

The driver's correctness gate records at most the first 50 sorted keys
of ``__spark_entry__.queries()``.  The engine implements more operators
than that, so the exposed registry consolidates same-granularity
queries into wide frames / tagged unions — every operator keeps a
value-checked oracle row, inside the 50-key window:

* ``q01_relational_suite``   = q01+q02+q03+q04+q05+q06, unpivoted to a
  common (query, grp, metric, val_d, val_l) shape — values pass through
  un-stringified so the hash check stays exact.
* ``q13_quality_surface``    = q13 heuristics + q44 Gopher repetition +
  q57 classifier score + q58 zlib compression ratio + q80 TRAINED
  classifier score (on-cluster logistic GD distilling the Gopher gate,
  integer-exact ⇒ the oracle replays training as unrolled SQL CTEs),
  one doc-level frame.  zlib is not SQL-expressible, so its oracle joins the
  committed ``artifacts/zlib_ratio.parquet`` fixture (generated from
  the corpus by scripts/make_zlib_fixture.py with the exact UDF
  semantics) on md5(text) — value-level, no longer rows-only.
* ``q14_langid``             = heuristic langid + fastText-.bin langid.
* ``q17_doc_hashes``         = q17 fingerprint + q18 exact-dedup groups
  + q19 MinHash signature + q22 SimHash, one doc-level frame.
* ``q20_candidate_pairs``    = q20 MinHash-LSH pairs + q21 pairwise
  Jaccard + q36 verified near-dups + q40 SimHash banded candidates,
  method-tagged union.
* ``q23_perplexity``         = q23 unigram + q39 bigram + q63 ARPA/KenLM
  perplexity, one doc-level frame.
* ``q24_ann``                = q24 brute-force + q25 sign-LSH + q32 IVF
  top-k, method-tagged union (brute_force is the labeled exact
  baseline; the approximate methods are the scale paths).
* ``q30_embedding_near_dups`` = single-key sign-LSH + banded
  OR-construction near-dup pairs, method-tagged union.
* ``q42_media_features``     = q42 byte-level media features (magic
  sniff + md5-seeded embedding over text payloads) + q76 REAL pixel
  decode (stdlib PNG/BMP/PPM with an analytic closed-form oracle),
  method-tagged union.
* ``q12_robots_filter``      = reference-parity F5 labels (q12) +
  opt-in robots path-rule enforcement (q78, the extension closing the
  reference's record-but-never-enforce discrepancy), method-tagged
  union.
* ``q38_robots_policy``      = q38 parser/fetch semantics + q79
  crawl-delay recrawl budgeting, one wide domain-level frame.
* ``q51_paragraph_dedup``    = q51 corpus-wide CCNet paragraph strip +
  q94 domain-scoped ratio boilerplate strip (RefinedWeb-style per-site
  clean), method-tagged union.
* ``q69_sequence_packing``   = q69 concat-and-chunk packing placement +
  q100 seeded deterministic corpus shuffle (pre-training layout that
  decorrelates crawl order), method-tagged union.

The fine-grained originals stay in ``queries.QUERIES`` (the FULL
registry) for tests, benches and `FULL=1 scripts/check_oracle.py`;
their per-operator plans remain the PLANS.md evidence.  The merged
Spark frames run the SAME operator implementations (imported, not
re-derived) — a merged green row certifies the same code paths.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fineweb_domain_analyzer_spark import queries as q
from fineweb_domain_analyzer_spark.functions.textfns import (
    content_fingerprint,
    langid_heuristic,
    ws_tokens,
)
from fineweb_domain_analyzer_spark.operators.dedup import (
    minhash_signature_from_shingles,
    simhash16_from_hex,
    token_hex4,
    word_shingles_from_tokens,
)

_ZLIB_FIXTURE = str(
    Path(__file__).resolve().parent / "artifacts" / "zlib_ratio.parquet"
)


# ---------------------------------------------------------------------------
# q01_relational_suite
# ---------------------------------------------------------------------------

# (subquery fn, sql, key cols, double metrics, long metrics)
_SUITE = [
    ("q01", "q01_pricing_summary", q.Q01_SQL,
     ["l_returnflag", "l_linestatus"],
     ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge",
      "avg_qty", "avg_price", "avg_disc"],
     ["count_order"]),
    ("q02", "q02_revenue_by_nation", q.Q02_SQL,
     ["r_name", "n_name"], ["revenue"], ["line_cnt"]),
    ("q03", "q03_top_customers", q.Q03_SQL,
     ["c_custkey", "c_name"], ["revenue"], ["order_cnt"]),
    ("q04", "q04_window_top_events", q.Q04_SQL,
     ["user_id", "event_id", "event_type"], ["value"], ["rn"]),
    ("q05", "q05_hourly_rollup", q.Q05_SQL,
     ["hour", "event_type"], ["total_value"], ["cnt"]),
    ("q06", "q06_sessionize", q.Q06_SQL,
     ["user_id"], [], ["events", "sessions"]),
]


def _unpivot_spark(
    df: DataFrame, qname: str, keys: list[str],
    d_metrics: list[str], l_metrics: list[str],
) -> DataFrame:
    """One-pass unpivot to (query, grp, metric, val_d, val_l): values
    stay typed (never stringified), so the driver's value hash is
    checking the same doubles/bigints the original query produced."""
    if keys:
        grp = F.concat_ws("|", *[F.col(c).cast("string") for c in keys])
    else:
        grp = F.lit("")  # single-row summary frames have no group key
    kvs = [
        F.struct(
            F.lit(m).alias("metric"),
            F.col(m).cast("double").alias("val_d"),
            F.lit(None).cast("bigint").alias("val_l"),
        )
        for m in d_metrics
    ] + [
        F.struct(
            F.lit(m).alias("metric"),
            F.lit(None).cast("double").alias("val_d"),
            F.col(m).cast("bigint").alias("val_l"),
        )
        for m in l_metrics
    ]
    return df.select(
        F.lit(qname).alias("query"),
        grp.alias("grp"),
        F.explode(F.array(*kvs)).alias("kv"),
    ).select("query", "grp", "kv.metric", "kv.val_d", "kv.val_l")


def _folded_union(
    spark: SparkSession, sf_dir: str, suite: list
) -> DataFrame:
    """Union the unpivoted members of a fold suite into one frame."""
    parts = [
        _unpivot_spark(q.QUERIES[full](spark, sf_dir), tag, keys, dm, lm)
        for tag, full, _sql, keys, dm, lm in suite
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def _folded_union_sql(suite: list) -> str:
    """Each member's SQL is evaluated ONCE as a materialized CTE and
    every metric block unpivots from that CTE — without this, a member
    with M metric columns would re-run its full query M times (the
    classifier members replay the whole unrolled training loop per
    metric, which made the q28 oracle ~5× slower than it needs to be)."""
    ctes, blocks = [], []
    for i, (tag, _full, sql, keys, dm, lm) in enumerate(suite):
        name = f"_fold_{tag}_{i}"
        ctes.append(f"{name} AS MATERIALIZED (\n{sql}\n)")
        grp = (
            " || '|' || ".join(f"CAST({k} AS VARCHAR)" for k in keys)
            if keys
            else "''"
        )
        for m in dm:
            blocks.append(
                f"SELECT '{tag}' AS query, {grp} AS grp, '{m}' AS metric,\n"
                f"       CAST({m} AS DOUBLE) AS val_d, CAST(NULL AS BIGINT) AS val_l\n"
                f"FROM {name}"
            )
        for m in lm:
            blocks.append(
                f"SELECT '{tag}' AS query, {grp} AS grp, '{m}' AS metric,\n"
                f"       CAST(NULL AS DOUBLE) AS val_d, CAST({m} AS BIGINT) AS val_l\n"
                f"FROM {name}"
            )
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(blocks)
    )


def q01_relational_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The six relational demos (scan/agg, multi-join, top-k, window,
    time rollup, sessionize) folded into one driver entry."""
    return _folded_union(spark, sf_dir, _SUITE)


def _suite_sql() -> str:
    return _folded_union_sql(_SUITE)


# ---------------------------------------------------------------------------
# q28_filter_metrics — global filter stats (A3) + drop-reason histogram
# (north-rule lineage) folded into one summary frame: both are tiny
# aggregates over the SAME flagship labels, so one entry covers both
# operators with typed values.
# ---------------------------------------------------------------------------

_FILTER_METRICS = [
    ("q28", "q28_filter_stats", q.Q28_SQL,
     [], ["keep_ratio"],
     ["total_processed", "filtered_kept", "excluded_count"]),
    ("q29", "q29_drop_reason_histogram", q.Q29_SQL,
     ["drop_reason"], [], ["cnt"]),
    # q81: held-out eval of the q80 trained classifier — md5-bucket
    # 80/20 split, exact binned AUC + confusion metrics, all
    # integer-derived (operators/training.py). The oracle replays
    # split + training + eval entirely in SQL.
    ("q81", "q81_classifier_eval", q._q81_sql(),
     [], ["auc", "accuracy", "precision", "recall", "f1"],
     ["n", "n_pos", "n_neg", "tp", "fp", "fn", "tn"]),
    # q82: the same eval grouped per language (bounded bins per group —
    # no whole-language document sort anywhere)
    ("q82", "q82_classifier_eval_by_lang", q._q82_sql(),
     ["lang"], ["auc", "accuracy", "precision", "recall", "f1"],
     ["n", "n_pos", "n_neg", "tp", "fp", "fn", "tn"]),
    # q83/q84: calibration of the trained classifier on the same
    # held-out split — per-bin reliability table (conf/acc/gap) and the
    # scalar ECE/MCE/Brier summary, all integer-exact over the 4dp
    # score domain (operators/training.py:reliability_bins /
    # calibration_metrics).
    ("q83", "q83_classifier_calibration", q._q83_sql(),
     ["bin"], ["conf", "acc", "gap"], ["n", "n_pos"]),
    ("q84", "q84_calibration_summary", q._q84_sql(),
     [], ["ece", "mce", "brier"], ["n"]),
    # q85/q86: operating-characteristic sweep over every distinct 4dp
    # threshold (keep iff score >= t) + the argmax-F1 serving
    # threshold — the evidence behind PipelineConfig.min_quality_score
    # (operators/training.py:threshold_sweep/best_operating_point).
    # t_si (integer 1e-4 units) is the key so no double round-trips
    # through the grp string.
    ("q85", "q85_threshold_sweep", q._q85_sql(),
     ["t_si"], ["threshold", "precision", "recall", "f1", "accuracy"],
     ["tp", "fp", "fn", "tn"]),
    ("q86", "q86_operating_point", q._q86_sql(),
     ["t_si"], ["threshold", "precision", "recall", "f1", "accuracy"],
     ["tp", "fp", "fn", "tn"]),
    # q101/q102: filter-cascade ablation audit — per-rule independent
    # fires + unique (marginal) drops, and the pairwise co-fire matrix
    # (operators/metrics.py:rule_ablation/rule_overlap). One fire-bit
    # map stage + a 1-row partial agg each; the oracle replays the
    # bits over the shared q56 feature CTEs.
    ("q101", "q101_rule_ablation", q._q101_sql(),
     ["rule"], [],
     ["fires", "unique_drops", "total_docs", "total_dropped"]),
    ("q102", "q102_rule_overlap", q._q102_sql(),
     ["rule_a", "rule_b"], [], ["both_fire"]),
    # q107: data-card summary — overall/decision/drop-reason/kept-
    # language doc+word counts from ONE cube pass over the flagship
    # labels (operators/metrics.py:data_card).
    ("q107", "q107_data_card", q._q107_sql(),
     ["section", "key"], [], ["docs", "words"]),
]


def q28_filter_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 global filter stats + drop-reason histogram + q81/q82
    held-out classifier eval (AUC/confusion) + q83/q84 calibration
    (reliability bins, ECE/MCE/Brier) + q85/q86 threshold sweep and
    argmax-F1 operating point, one summary frame."""
    return _folded_union(spark, sf_dir, _FILTER_METRICS)


def _filter_metrics_sql() -> str:
    return _folded_union_sql(_FILTER_METRICS)


# ---------------------------------------------------------------------------
# q34_corpus_profiles — vocabulary heavy hitters + doc-length histogram:
# the two per-snapshot corpus profile reports, same summary granularity.
# ---------------------------------------------------------------------------

_CORPUS_PROFILES = [
    ("q34", "q34_vocab_topk", q.Q34_SQL, ["token"], [], ["cnt"]),
    ("q35", "q35_length_histogram", q.Q35_SQL, ["bucket"], ["share"], ["cnt"]),
    # q87–q89: dump-over-dump drift monitoring (operators/drift.py) —
    # per-language and per-quality-decile share deltas with per-category
    # Jensen-Shannon terms, plus the quantized-exact scalar JS per
    # dimension.
    ("q87", "q87_language_drift", q._q87_sql(),
     ["category"], ["p0", "p1", "js_term"], ["n0", "n1"]),
    ("q88", "q88_quality_drift", q._q88_sql(),
     ["category"], ["p0", "p1", "js_term"], ["n0", "n1"]),
    ("q89", "q89_drift_summary", q._q89_sql(),
     ["dimension"], ["js"], ["n0", "n1"]),
    # q90/q91: target-mixture sampling plan + applied outcome
    # (operators/mixing.py) — balanced language shares, integer-exact
    # rates/epochs/achieved-shares, no floats anywhere.
    ("q90", "q90_mixture_plan", q._q90_sql(),
     ["grp"], [],
     ["n_available", "target_bp", "rate_e4", "epochs", "rem_e4"]),
    ("q91", "q91_mixture_summary", q._q91_sql(),
     ["grp"], [], ["n_available", "n_sampled", "achieved_bp"]),
    # q93: context-window chunking (operators/chunking.py) — map-only
    # sliding token windows; chunk_hash rides as a key so the fold's
    # value check covers the window CONTENT, not just counts.
    ("q93", "q93_token_chunks", q._q93_sql(),
     ["doc_id", "chunk_id", "chunk_hash"], [], ["chunk_tokens"]),
    # q95: per-domain tf-idf signature terms (operators/domain_stats.py
    # :domain_signature_terms) — exact integer tf*10000//df score, so
    # the fold's value check is bit-level.
    ("q95", "q95_domain_signature_terms", q.Q95_SQL,
     ["source", "token"], [], ["tf", "df", "score_e4", "rnk"]),
    # q104: Gopher doc-shape rules (bullet/ellipsis line fractions,
    # alpha-word fraction, #/… symbol-to-word ratios) over the
    # deterministically line-structured corpus view — all codegen,
    # zero shuffles (operators/quality.py:with_doc_shape_features).
    ("q104", "q104_doc_shape", q._q104_sql(), ["doc_id"],
     ["bullet_start_frac", "ellipsis_end_frac", "alpha_word_frac",
      "hash_word_ratio", "ellipsis_word_ratio"],
     ["n_lines", "shape_keep"]),
    # q105: REAL outlink extraction (regexp_extract_all hrefs from
    # synthesized HTML) → weighted host graph — upgrades q97's declared
    # synthetic-edge stand-in (functions/html.py:extract_hrefs,
    # operators/graph.py:outlink_edges_from_html).
    ("q105", "q105_outlink_graph", q.Q105_SQL,
     ["src_host", "dst_host"], [], ["n_links"]),
    # q108: (href, anchor-text) pair extraction — link-text signals
    # (functions/html.py:extract_anchors; full-match + group-extract
    # regex chain, explode only, zero shuffles).
    ("q108", "q108_anchor_text", q.Q108_SQL,
     ["doc_id", "href", "anchor_text"], [], ["text_len"]),
    # q109: robots Sitemap directives (RFC 9309 non-group records the
    # reference parser ignores; functions/robots.py:sitemaps_from_robots).
    ("q109", "q109_sitemaps", q.Q109_SQL,
     ["domain", "sitemap_url"], [], ["sm_idx"]),
    # q110: <title> / meta-description extraction (functions/html.py) —
    # page metadata for snippets, URL-title consistency, title dedup.
    ("q110", "q110_page_metadata", q.Q110_SQL,
     ["doc_id", "title", "meta_description"], [], ["title_len"]),
    # q111: ftfy-style mojibake repair — planted latin-1 mis-decode
    # corruption must be detected and byte-exactly restored (UDF; the
    # oracle joins the committed fixture built from the same functions).
    ("q111", "q111_mojibake_repair", q._q111_sql(),
     ["doc_id", "fixed_md5"], [],
     ["corrupted", "mojibake_fixed", "restored"]),
    # q112: SURT reversed-host sort keys (site-local crawl layout).
    ("q112", "q112_surt_keys", q.Q112_SQL,
     ["doc_id", "surt"], [], ["surt_len"]),
    # q113: RFC 9309 longest-match Allow/Disallow vs the naive
    # any-Disallow-prefix rule (operators/filtering.py:
    # rfc9309_path_allowed) — the Allow carve-out honored.
    ("q113", "q113_rfc9309_match", q.Q113_SQL,
     ["doc_id", "path"], [], ["rfc_allowed", "naive_blocked"]),
    # q114: quality-priority duplicate selection — keep the BEST
    # cluster member, not min-id (operators/dedup.py:
    # select_cluster_representatives).
    ("q114", "q114_best_of_cluster", q._q114_sql(),
     ["cluster", "rep_id"], ["rep_score"], ["n_members"]),
    # q96: embedding-space outlier pruning (operators/similarity.py
    # :embedding_outliers) — IVF assignment + banded per-cluster
    # percentile; band 1 = the farthest 5%.
    ("q96", "q96_embedding_outliers", q.Q96_SQL,
     ["vec_id"], ["cos_c"], ["cluster_id", "band", "is_outlier"]),
    # q97/q98: link-graph analytics (operators/graph.py) — weighted
    # host-level edge list and 3-iteration integer fixed-point PageRank
    # over the deterministic outlink graph; fixed-point ranks make the
    # fold's value check bit-exact across engines.
    ("q97", "q97_host_graph", q.Q97_SQL,
     ["src_host", "dst_host"], [], ["n_links"]),
    ("q98", "q98_pagerank", q._q98_sql(),
     ["doc_id"], [], ["rank"]),
    # q99: unicode normalization stage (functions/textfns.py
    # :normalize_text) — norm_hash rides as a key so the fold checks
    # the normalized BYTES against DuckDB's utf8proc NFC, not just
    # lengths; ascii_fast_path certifies the JVM-gate split.
    ("q99", "q99_text_normalize", q._q99_sql(),
     ["doc_id", "ascii_fast_path", "norm_hash"], [], ["norm_len"]),
]


def q34_corpus_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocab top-k + length histogram + dump-drift monitoring
    (q87/q88/q89) + mixture planning (q90/q91) + token chunking (q93)
    + domain signature terms (q95) + embedding outliers (q96) +
    link-graph / PageRank (q97/q98) + unicode normalization (q99)
    folded into one profile frame."""
    return _folded_union(spark, sf_dir, _CORPUS_PROFILES)


def _corpus_profiles_sql() -> str:
    return _folded_union_sql(_CORPUS_PROFILES)


# ---------------------------------------------------------------------------
# q13_quality_surface
# ---------------------------------------------------------------------------

def q13_quality_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level quality surface: Gopher/C4 heuristics + n-gram
    repetition + classifier score + zlib compression ratio + page-type
    heuristics (q103), composed as column adders over ONE scan — the
    whole frame is a single map stage (repetition's sorted-runs fold
    included), no joins, no shuffles."""
    from fineweb_domain_analyzer_spark.operators.quality import (
        with_compression_ratio,
        with_quality_score,
    )
    from fineweb_domain_analyzer_spark.operators.textclean import (
        with_ngram_repetition,
    )

    from fineweb_domain_analyzer_spark.operators.pagetype import (
        with_page_type,
    )

    feats = q._gate_labeled_feats(spark, sf_dir).drop("_bucket")
    # q80: distill the gate into trained logistic weights (integer-exact
    # GD, operators/training.py; memoized per sf_dir), served through
    # the same score plan
    weights = q._trained_weights(spark, sf_dir, "full")
    df = with_quality_score(feats)
    df = with_quality_score(df, weights=weights, out_col="trained_score")
    df = with_ngram_repetition(df)
    df = with_compression_ratio(df)
    # q103: page-type heuristics fuse into the same map stage
    df = with_page_type(df, rules=q._Q103_RULES, idx_col="rule_idx")
    return df.select(
        "doc_id",
        F.col("word_count").cast("bigint").alias("word_count"),
        "mean_word_len",
        "symbol_ratio",
        "stopword_density",
        "max_word_repeat_ratio",
        "top2gram_char_frac",
        "dup5gram_char_frac",
        "quality_score",
        (F.col("quality_score") >= 0.5).alias("keep_by_score"),
        "compression_ratio",
        "distill_label",
        "trained_score",
        (F.col("trained_score") >= 0.5).alias("trained_keep"),
        "page_type",
        "rule_idx",
    )


def _quality_surface_sql() -> str:
    rep = (
        """rep_toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents
),"""
        + q._rep_sql(2, "sum(CASE WHEN rn = 1 THEN c * length(g) ELSE 0 END)",
                     "top2gram_char_frac")
        + ","
        + q._rep_sql(5, "sum(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END)",
                     "dup5gram_char_frac")
    )
    return f"""
WITH {q._feats_cte()},
{rep},
zr AS (
  SELECT d.doc_id, f.compression_ratio
  FROM documents d
  LEFT JOIN read_parquet('{_ZLIB_FIXTURE}') f ON md5(d.text) = f.text_md5
),
pt AS (
{q._q103_sql()}
),
{q._q80_training_ctes()}
SELECT feats.doc_id,
       CAST(feats.word_count AS BIGINT) AS word_count,
       feats.mean_word_len, feats.symbol_ratio, feats.stopword_density,
       feats.max_word_repeat_ratio,
       a2.top2gram_char_frac, a5.dup5gram_char_frac,
       {q._SCORE_SQL} AS quality_score,
       {q._SCORE_SQL} >= 0.5 AS keep_by_score,
       zr.compression_ratio,
       CASE WHEN {q._gopher_gate_sql('feats.')} THEN TRUE ELSE FALSE END AS distill_label,
       {q._q80_score_sql('feats.')} AS trained_score,
       {q._q80_score_sql('feats.')} >= 0.5 AS trained_keep,
       pt.page_type, pt.rule_idx
FROM feats
JOIN a2 ON feats.doc_id = a2.doc_id
JOIN a5 ON feats.doc_id = a5.doc_id
JOIN zr ON feats.doc_id = zr.doc_id
JOIN pt ON feats.doc_id = pt.doc_id
CROSS JOIN twf
"""


# ---------------------------------------------------------------------------
# q14_langid (heuristic + fastText-format .bin)
# ---------------------------------------------------------------------------

def q14_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID three ways in one projection: the JVM-side stopword
    heuristic, the committed fastText-format .bin artifact through the
    Arrow UDF (per-executor model cache), and the q106 segment-level
    consistency summary (mixed-language detection)."""
    from fineweb_domain_analyzer_spark.functions.textfns import (
        with_lang_consistency,
    )
    from fineweb_domain_analyzer_spark.operators.quality import (
        langid_udf_for,
        register_model_artifact,
    )

    register_model_artifact(spark, "langid_fx", q._artifact("langid_marker.bin"))
    docs = q._t(spark, sf_dir, "documents")
    return with_lang_consistency(docs, seg_tokens=q._Q106_SEG).select(
        "doc_id",
        langid_heuristic(F.col("text")).alias("langid_pred"),
        langid_udf_for("langid_fx")(F.col("text")).alias("ft_label"),
        "n_segments",
        "majority_lang",
        "majority_frac",
        "n_langs",
        "lang_mixed",
    )


def _langid_merged_sql() -> str:
    return f"""
WITH lh AS (SELECT * FROM ({q._langid_sql()})),
     fh AS (SELECT * FROM ({q._q62_sql()})),
     lc AS ({q._q106_sql()})
SELECT lh.doc_id, lh.langid_pred, fh.ft_label,
       lc.n_segments, lc.majority_lang, lc.majority_frac,
       lc.n_langs, lc.lang_mixed
FROM lh JOIN fh ON lh.doc_id = fh.doc_id
JOIN lc ON lh.doc_id = lc.doc_id
"""


# ---------------------------------------------------------------------------
# q17_doc_hashes (fingerprint + exact-dedup groups + minhash sig + simhash)
# ---------------------------------------------------------------------------

def q17_doc_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every per-document dedup signal in one frame: bag-of-words
    fingerprint, exact text hash (with canonical = min doc_id per
    group, the exact-dedup semantics), MinHash signature (k=8) and
    16-bit SimHash.  All signals are computed in one map stage; the two
    canonical ids are hash-key windows (the same one-shuffle-per-key
    shape the standalone operators use)."""
    docs = q._t(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("text_hash"),
        content_fingerprint(F.col("text")).alias("fp"),
        ws_tokens(F.lower(F.col("text"))).alias("_tk"),
        token_hex4(F.col("text")).alias("_hx"),
    ).select(
        "doc_id", "text_hash", "fp",
        word_shingles_from_tokens(F.col("_tk")).alias("_sh"),
        simhash16_from_hex(F.col("_hx")).alias("simhash"),
    ).select(
        "doc_id", "text_hash", "fp", "simhash",
        F.concat_ws("|", minhash_signature_from_shingles(F.col("_sh"), k=8)).alias("sig"),
    )
    return staged.withColumn(
        "fp_canonical_id", F.min("doc_id").over(Window.partitionBy("fp"))
    ).withColumn(
        "exact_canonical_id", F.min("doc_id").over(Window.partitionBy("text_hash"))
    )


def _doc_hashes_sql() -> str:
    return f"""
WITH staged AS (
  SELECT doc_id,
         md5(text) AS text_hash,
         md5(array_to_string(list_sort(list_distinct({q.TOKS_SQL})), ' ')) AS fp,
         {q.SHINGLES_SQL} AS sh,
         {q._simhash_expr_sql()} AS simhash
  FROM documents
),
sigd AS (
  SELECT doc_id, text_hash, fp, simhash,
         array_to_string(
           list_transform(range(0, 8),
             i -> list_aggregate(
                    list_transform(sh, s -> md5(CAST(i AS VARCHAR) || ':' || s)),
                    'min')),
           '|') AS sig
  FROM staged
)
SELECT doc_id, text_hash, fp, simhash, sig,
       min(doc_id) OVER (PARTITION BY fp) AS fp_canonical_id,
       min(doc_id) OVER (PARTITION BY text_hash) AS exact_canonical_id
FROM sigd
"""


# ---------------------------------------------------------------------------
# q20_candidate_pairs (LSH ∪ Jaccard ∪ verified near-dup ∪ SimHash bands)
# ---------------------------------------------------------------------------

def _pad_pairs(
    df: DataFrame, method: str, *,
    jaccard: bool = False, sim: bool = False,
) -> DataFrame:
    cols = [
        F.lit(method).alias("method"),
        F.col("id_a"),
        F.col("id_b"),
        (F.col("jaccard") if jaccard else F.lit(None).cast("double")).alias("jaccard"),
        (F.col("sim_a") if sim else F.lit(None).cast("bigint")).alias("sim_a"),
        (F.col("sim_b") if sim else F.lit(None).cast("bigint")).alias("sim_b"),
        (F.col("hamming") if sim else F.lit(None).cast("int")).alias("hamming"),
    ]
    return df.select(*cols)


def q20_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four pairwise dedup-candidate paths, method-tagged: raw
    MinHash-LSH band pairs, exact shingle-Jaccard on a fixed pair list,
    the full candidates→verify near-dup composition, and SimHash banded
    candidates.  Each branch is the standalone operator composition —
    the union certifies all four in one driver row."""
    return (
        _pad_pairs(q.q20_lsh_pairs(spark, sf_dir), "minhash_lsh")
        .unionAll(_pad_pairs(q.q21_ngram_jaccard(spark, sf_dir), "jaccard",
                             jaccard=True))
        .unionAll(_pad_pairs(q.q36_near_dedup(spark, sf_dir), "near_dedup",
                             jaccard=True))
        .unionAll(_pad_pairs(q.q40_simhash_candidates(spark, sf_dir), "simhash",
                             sim=True))
    )


def _candidate_pairs_sql() -> str:
    def block(method, sql, jaccard=False, sim=False):
        j = "jaccard" if jaccard else "CAST(NULL AS DOUBLE) AS jaccard"
        s = ("sim_a, sim_b, hamming" if sim
             else "CAST(NULL AS BIGINT) AS sim_a, CAST(NULL AS BIGINT) AS sim_b, "
                  "CAST(NULL AS INTEGER) AS hamming")
        return (f"SELECT '{method}' AS method, id_a, id_b, {j}, {s}\n"
                f"FROM ({sql})")

    return "\nUNION ALL\n".join([
        block("minhash_lsh", q.Q20_SQL),
        block("jaccard", q.Q21_SQL, jaccard=True),
        block("near_dedup", q.Q36_SQL, jaccard=True),
        block("simhash", q._q40_sql(), sim=True),
    ])


# ---------------------------------------------------------------------------
# q23_perplexity (unigram + bigram + ARPA/KenLM)
# ---------------------------------------------------------------------------

def q23_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three LM-perplexity scorers in one doc-level frame: corpus
    unigram LM, corpus bigram LM (both distributed LM build + broadcast
    score join) and the committed ARPA artifact through the KenLM-
    semantics Arrow UDF (map-only) — plus the q92 CCNet head/middle/
    tail per-language tercile split derived from the unigram score."""
    from fineweb_domain_analyzer_spark.operators.quality import (
        bigram_perplexity,
        perplexity_udf_for,
        register_model_artifact,
        unigram_perplexity,
    )

    register_model_artifact(spark, "kenlm_fx", q._artifact("tiny_unigram.arpa"))
    docs = q._t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.round(perplexity_udf_for("kenlm_fx")(F.col("text")), 4).alias("arpa_ppl"),
    )
    uni = unigram_perplexity(docs)
    bi = bigram_perplexity(docs)
    cc = q.q92_ccnet_split(spark, sf_dir).select(
        "doc_id", "lang", "tercile", "split"
    )
    return (
        base.join(uni, "doc_id", "left")
        .join(bi, "doc_id", "left")
        .join(cc, "doc_id", "left")
        .select(
            "doc_id", "perplexity", "bigram_perplexity", "arpa_ppl",
            "lang", "tercile", "split",
        )
    )


def _perplexity_sql() -> str:
    return f"""
WITH u AS (SELECT * FROM ({q.Q23_SQL})),
     b AS (SELECT * FROM ({q.Q39_SQL})),
     a AS (SELECT * FROM ({q._q63_sql()})),
     c AS (SELECT * FROM ({q._q92_sql()}))
SELECT a.doc_id, u.perplexity, b.bigram_perplexity, a.arpa_ppl,
       c.lang, c.tercile, c.split
FROM a
LEFT JOIN u ON a.doc_id = u.doc_id
LEFT JOIN b ON a.doc_id = b.doc_id
LEFT JOIN c ON a.doc_id = c.doc_id
"""


# ---------------------------------------------------------------------------
# q24_ann (brute-force ∪ sign-LSH ∪ IVF)
# ---------------------------------------------------------------------------

def q24_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k neighbor search three ways, method-tagged: exact
    brute-force cosine (the labeled baseline), sign-LSH buckets and
    IVF nprobe=1 (the scale paths)."""
    def tag(df, m):
        return df.select(F.lit(m).alias("method"), "query_id", "neighbor_id",
                         "cos", "rk")

    return (
        tag(q.q24_ann_brute_force(spark, sf_dir), "brute_force")
        .unionAll(tag(q.q25_ann_lsh(spark, sf_dir), "sign_lsh"))
        .unionAll(tag(q.q32_ann_ivf(spark, sf_dir), "ivf"))
    )


def _ann_sql() -> str:
    def block(m, sql):
        return (f"SELECT '{m}' AS method, query_id, neighbor_id, cos, rk\n"
                f"FROM ({sql})")

    return "\nUNION ALL\n".join([
        block("brute_force", q.Q24_SQL),
        block("sign_lsh", q.Q25_SQL),
        block("ivf", q.Q32_SQL),
    ])


# ---------------------------------------------------------------------------
# q30_embedding_near_dups (single-key ∪ banded OR-construction)
# ---------------------------------------------------------------------------

def q30_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via both bucketing constructions:
    one 8-bit sign-LSH key, and the 2×4-bit banded OR-construction
    (the recall knob that survives corpus growth)."""
    def tag(df, m):
        return df.select(F.lit(m).alias("method"), "id_a", "id_b", "cos")

    return tag(q.q30_embedding_near_dups(spark, sf_dir), "sign_lsh").unionAll(
        tag(q.q43_embedding_near_dups_banded(spark, sf_dir), "banded_or")
    )


def _embedding_near_dups_sql() -> str:
    return (
        f"SELECT 'sign_lsh' AS method, id_a, id_b, cos FROM ({q.Q30_SQL})\n"
        f"UNION ALL\n"
        f"SELECT 'banded_or' AS method, id_a, id_b, cos FROM ({q.Q43_SQL})"
    )


# ---------------------------------------------------------------------------
# q42_media_features (byte features ∪ real pixel decode)
# ---------------------------------------------------------------------------

def q42_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media surface, method-tagged: the byte-level feature path (magic
    sniff + md5-seeded embedding, SQL-mirrored oracle), the REAL
    pixel-decode path (stdlib PNG/BMP/PPM/GIF decoders over
    formula-pixel assets) and the REAL audio-decode path (RIFF/WAVE
    PCM over formula-sample assets) — both decode paths carry
    closed-form analytic oracles."""
    _NULLS = [
        ("byte_len", "bigint"), ("fv", "string"),
        ("width", "int"), ("height", "int"),
        ("sum_r", "bigint"), ("sum_g", "bigint"), ("sum_b", "bigint"),
        ("sample_rate", "int"), ("n_frames", "bigint"),
        ("n_channels", "int"), ("sum_samples", "bigint"),
        ("sum_abs", "bigint"),
    ]

    def pad(df: DataFrame, method: str, fmt_col, present: dict) -> DataFrame:
        cols = [F.lit(method).alias("method"), F.col("asset_id"), fmt_col]
        for name, typ in _NULLS:
            cols.append(
                present[name] if name in present
                else F.lit(None).cast(typ).alias(name)
            )
        return df.select(*cols)

    bytes_side = pad(
        q.q42_media_features(spark, sf_dir), "byte_features",
        F.col("sniffed_format"),
        {"byte_len": F.col("byte_len"), "fv": F.col("fv")},
    )
    pixel_side = pad(
        q.q76_pixel_stats(spark, sf_dir), "pixel_stats",
        F.col("fmt").alias("sniffed_format"),
        {n: F.col(n) for n in ("width", "height", "sum_r", "sum_g", "sum_b")},
    )
    audio_side = pad(
        q.q77_audio_stats(spark, sf_dir), "audio_stats",
        F.lit("wav").alias("sniffed_format"),
        {n: F.col(n) for n in
         ("sample_rate", "n_frames", "n_channels", "sum_samples", "sum_abs")},
    )
    return bytes_side.unionAll(pixel_side).unionAll(audio_side)


def _media_features_sql() -> str:
    null_cols = (
        "CAST(NULL AS BIGINT) AS byte_len, CAST(NULL AS VARCHAR) AS fv, "
        "CAST(NULL AS INTEGER) AS width, CAST(NULL AS INTEGER) AS height, "
        "CAST(NULL AS BIGINT) AS sum_r, CAST(NULL AS BIGINT) AS sum_g, "
        "CAST(NULL AS BIGINT) AS sum_b, "
        "CAST(NULL AS INTEGER) AS sample_rate, CAST(NULL AS BIGINT) AS n_frames, "
        "CAST(NULL AS INTEGER) AS n_channels, CAST(NULL AS BIGINT) AS sum_samples, "
        "CAST(NULL AS BIGINT) AS sum_abs"
    )

    def block(method: str, sql: str, fmt: str, keep: set[str]) -> str:
        cols = ", ".join(
            part if part.split(" AS ")[-1] not in keep
            else part.split(" AS ")[-1]
            for part in null_cols.split(", ")
        )
        return (
            f"SELECT '{method}' AS method, asset_id, {fmt} AS sniffed_format, "
            f"{cols}\nFROM ({sql})"
        )

    return "\nUNION ALL\n".join(
        [
            block("byte_features", q.Q42_SQL, "sniffed_format",
                  {"byte_len", "fv"}),
            block("pixel_stats", q.Q76_SQL, "fmt",
                  {"width", "height", "sum_r", "sum_g", "sum_b"}),
            block("audio_stats", q.Q77_SQL, "'wav'",
                  {"sample_rate", "n_frames", "n_channels", "sum_samples",
                   "sum_abs"}),
        ]
    )


# ---------------------------------------------------------------------------
# q12_robots_filter (reference-parity labels ∪ opt-in path enforcement)
# ---------------------------------------------------------------------------

def q12_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship robots filter in both modes, method-tagged:
    ``reference_parity`` is the exact F5 truth table (disallowed_paths
    recorded, never enforced — fineweb_analyzer.py:436-459);
    ``enforce_paths`` is the opt-in RFC 9309 prefix-match extension
    (label_pages(enforce_paths=True), drop_reason
    'robots_path_disallowed'). Both sides run the same label_pages
    operator — one broadcast join each, no fact-side shuffle."""
    def tag(df, m):
        return df.select(
            F.lit(m).alias("mode"), "doc_id", "domain", "keep", "drop_reason"
        )

    return tag(q.QUERIES["q12_robots_filter"](spark, sf_dir), "reference_parity").unionAll(
        tag(q.QUERIES["q78_robots_path_enforcement"](spark, sf_dir), "enforce_paths")
    )


def _robots_filter_sql() -> str:
    return (
        f"SELECT 'reference_parity' AS mode, doc_id, domain, keep, drop_reason "
        f"FROM ({q.Q12_SQL})\n"
        f"UNION ALL\n"
        f"SELECT 'enforce_paths' AS mode, doc_id, domain, keep, drop_reason "
        f"FROM ({q.Q78_SQL})"
    )


# ---------------------------------------------------------------------------
# q38_robots_policy (parser/fetch semantics ∪ crawl-delay recrawl budget)
# ---------------------------------------------------------------------------

def q38_robots_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots policy dimension, widened with the recrawl budget: the
    q38 parser/fetch-semantics columns full-outer-joined on domain with
    q79's crawl-delay budgeting (max fetches per politeness window,
    windows needed for the domain's page inventory). Full outer because
    the page-side inventory also contains the ':8080' port-quirk domains
    the policy never covers."""
    pol = q.QUERIES["q38_robots_policy"](spark, sf_dir)
    plan = q.QUERIES["q79_recrawl_plan"](spark, sf_dir)
    return pol.join(plan, "domain", "full_outer")


def _robots_policy_sql() -> str:
    return (
        "SELECT coalesce(a.domain, b.domain) AS domain,\n"
        "       a.robots_exists, a.crawl_allowed, a.crawl_delay,\n"
        "       a.n_disallowed, a.had_error,\n"
        "       b.page_cnt, b.fetchable, b.delay_s,\n"
        "       b.max_fetches_per_window, b.windows_needed, b.over_budget\n"
        f"FROM ({q.Q38_SQL}) a FULL OUTER JOIN ({q.Q79_SQL}) b\n"
        "  ON a.domain = b.domain"
    )


# ---------------------------------------------------------------------------
# q51_paragraph_dedup (corpus-wide CCNet strip ∪ domain-scoped ratio strip)
# ---------------------------------------------------------------------------

def q51_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph boilerplate removal in both scopes, method-tagged:
    ``ccnet_corpus`` is the corpus-wide ≥3-distinct-docs strip
    (operators/textclean.py:paragraph_dedup); ``domain_ratio`` is the
    RefinedWeb-style per-site clean (domain_boilerplate_removal:
    boilerplate only within its own domain, exact-integer ≥50%-of-
    domain-docs ratio test, so small sites' repeated headers are
    caught and cross-site phrase collisions never delete anything).
    Same deterministic 3-token chunking on both sides."""
    def tag(df, m, with_source):
        return df.select(
            F.lit(m).alias("method"),
            "doc_id",
            (F.col("source") if with_source else F.lit(None).cast("string")).alias(
                "source"
            ),
            "n_paras",
            "n_removed",
            "cleaned_text",
        )

    return tag(
        q.QUERIES["q51_paragraph_dedup"](spark, sf_dir), "ccnet_corpus", False
    ).unionAll(
        tag(q.QUERIES["q94_domain_boilerplate"](spark, sf_dir), "domain_ratio", True)
    )


def _paragraph_dedup_sql() -> str:
    return (
        "SELECT 'ccnet_corpus' AS method, doc_id, CAST(NULL AS VARCHAR) AS source, "
        "n_paras, n_removed, cleaned_text "
        f"FROM ({q.Q51_SQL})\n"
        "UNION ALL\n"
        "SELECT 'domain_ratio' AS method, doc_id, source, "
        "n_paras, n_removed, cleaned_text "
        f"FROM ({q.Q94_SQL})"
    )


# ---------------------------------------------------------------------------
# q69_sequence_packing (packing placement ∪ deterministic shuffle layout)
# ---------------------------------------------------------------------------

def q69_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-layout plans, method-tagged: the GPT-style
    concat-and-chunk packing placement (q69, per-shard windows) and the
    seeded deterministic corpus shuffle (q100, md5-prefix hash order
    that decorrelates crawl order before packing). Both are
    integer-exact placement maps over the same doc_id key."""
    pack = q.q69_sequence_packing(spark, sf_dir).select(
        F.lit("pack").alias("method"),
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        "tokens",
        "start_seq",
        "start_offset",
        F.lit(None).cast("bigint").alias("shuffle_hash"),
        F.lit(None).cast("bigint").alias("shard_rank"),
    )
    shuf = q.q100_deterministic_shuffle(spark, sf_dir).select(
        F.lit("shuffle").alias("method"),
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        F.lit(None).cast("bigint").alias("tokens"),
        F.lit(None).cast("bigint").alias("start_seq"),
        F.lit(None).cast("bigint").alias("start_offset"),
        "shuffle_hash",
        "shard_rank",
    )
    return pack.unionAll(shuf)


def _sequence_packing_sql() -> str:
    return (
        "SELECT 'pack' AS method, doc_id, CAST(shard AS BIGINT) AS shard, "
        "tokens, start_seq, start_offset, "
        "CAST(NULL AS BIGINT) AS shuffle_hash, "
        "CAST(NULL AS BIGINT) AS shard_rank "
        f"FROM ({q.Q69_SQL})\n"
        "UNION ALL\n"
        "SELECT 'shuffle' AS method, doc_id, CAST(shard AS BIGINT) AS shard, "
        "CAST(NULL AS BIGINT) AS tokens, CAST(NULL AS BIGINT) AS start_seq, "
        "CAST(NULL AS BIGINT) AS start_offset, shuffle_hash, shard_rank "
        f"FROM ({q.Q100_SQL})"
    )


# ---------------------------------------------------------------------------
# exposed registry: every operator, ≤ 50 keys
# ---------------------------------------------------------------------------

_MERGED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q01_relational_suite": q01_relational_suite,
    "q12_robots_filter": q12_robots_filter,
    "q38_robots_policy": q38_robots_policy,
    "q13_quality_surface": q13_quality_surface,
    "q14_langid": q14_langid,
    "q17_doc_hashes": q17_doc_hashes,
    "q20_candidate_pairs": q20_candidate_pairs,
    "q28_filter_metrics": q28_filter_metrics,
    "q34_corpus_profiles": q34_corpus_profiles,
    "q23_perplexity": q23_perplexity,
    "q24_ann": q24_ann,
    "q30_embedding_near_dups": q30_embedding_near_dups,
    "q42_media_features": q42_media_features,
    "q51_paragraph_dedup": q51_paragraph_dedup,
    "q69_sequence_packing": q69_sequence_packing,
}

_FOLDED = {
    "q01_pricing_summary", "q02_revenue_by_nation", "q03_top_customers",
    "q04_window_top_events", "q05_hourly_rollup", "q06_sessionize",
    "q13_quality_features", "q44_gopher_repetition", "q57_quality_score",
    "q58_compression_ratio",
    "q14_langid", "q62_fasttext_bin_langid",
    "q17_fingerprint", "q18_exact_dedup", "q19_minhash_signature",
    "q22_simhash",
    "q20_lsh_pairs", "q21_ngram_jaccard", "q36_near_dedup",
    "q40_simhash_candidates",
    "q28_filter_stats", "q29_drop_reason_histogram",
    "q34_vocab_topk", "q35_length_histogram",
    "q23_unigram_perplexity", "q39_bigram_perplexity", "q63_arpa_perplexity",
    "q24_ann_brute_force", "q25_ann_lsh", "q32_ann_ivf",
    "q30_embedding_near_dups", "q43_embedding_near_dups_banded",
    "q76_pixel_stats", "q77_audio_stats",
    "q12_robots_filter", "q78_robots_path_enforcement",
    "q38_robots_policy", "q79_recrawl_plan",
    "q80_trained_quality_score",
    "q81_classifier_eval", "q82_classifier_eval_by_lang",
    "q83_classifier_calibration", "q84_calibration_summary",
    "q85_threshold_sweep", "q86_operating_point",
    "q87_language_drift", "q88_quality_drift", "q89_drift_summary",
    "q90_mixture_plan", "q91_mixture_summary",
    "q92_ccnet_split", "q93_token_chunks",
    "q51_paragraph_dedup", "q94_domain_boilerplate",
    "q95_domain_signature_terms", "q96_embedding_outliers",
    "q97_host_graph", "q98_pagerank", "q99_text_normalize",
    "q69_sequence_packing", "q100_deterministic_shuffle",
    "q101_rule_ablation", "q102_rule_overlap",
    "q103_page_type", "q104_doc_shape", "q105_outlink_graph",
    "q106_lang_consistency", "q107_data_card", "q108_anchor_text",
    "q109_sitemaps", "q110_page_metadata", "q111_mojibake_repair",
    "q112_surt_keys", "q113_rfc9309_match", "q114_best_of_cluster",
}


def exposed_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, fn in q.QUERIES.items():
        if name not in _FOLDED:
            out[name] = fn
    out.update(_MERGED_QUERIES)
    return dict(sorted(out.items()))


def merged_oracle_sql() -> dict[str, str]:
    return {
        "q01_relational_suite": _suite_sql(),
        "q12_robots_filter": _robots_filter_sql(),
        "q38_robots_policy": _robots_policy_sql(),
        "q13_quality_surface": _quality_surface_sql(),
        "q14_langid": _langid_merged_sql(),
        "q17_doc_hashes": _doc_hashes_sql(),
        "q20_candidate_pairs": _candidate_pairs_sql(),
        "q28_filter_metrics": _filter_metrics_sql(),
        "q34_corpus_profiles": _corpus_profiles_sql(),
        "q23_perplexity": _perplexity_sql(),
        "q24_ann": _ann_sql(),
        "q30_embedding_near_dups": _embedding_near_dups_sql(),
        "q42_media_features": _media_features_sql(),
        "q51_paragraph_dedup": _paragraph_dedup_sql(),
        "q69_sequence_packing": _sequence_packing_sql(),
    }


def exposed_oracle_sql() -> dict[str, str]:
    base = q.oracle_sql()
    out = {k: v for k, v in base.items() if k not in _FOLDED}
    out.update(merged_oracle_sql())
    return dict(sorted(out.items()))


# some merged keys reuse a fine-grained name; in the FULL registry the
# original stays checkable under a disambiguated key
_RENAMED_IN_FULL = {
    "q12_robots_filter": "q12_robots_filter_reference_parity",
    "q14_langid": "q14_langid_heuristic_only",
    "q38_robots_policy": "q38_robots_policy_parser_only",
    "q30_embedding_near_dups": "q30_embedding_near_dups_single_key",
    "q42_media_features": "q42_media_features_bytes",
    "q51_paragraph_dedup": "q51_paragraph_dedup_corpus",
    "q69_sequence_packing": "q69_sequence_packing_plan_only",
}


def full_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Fine-grained originals ∪ merged frames — for local check_oracle
    FULL=1 runs and tests; the driver sees exposed_queries()."""
    out = {_RENAMED_IN_FULL.get(k, k): fn for k, fn in q.QUERIES.items()}
    out.update(_MERGED_QUERIES)
    return dict(sorted(out.items()))


def full_oracle_sql() -> dict[str, str]:
    out = {_RENAMED_IN_FULL.get(k, k): v for k, v in q.oracle_sql().items()}
    out.update(merged_oracle_sql())
    return dict(sorted(out.items()))
