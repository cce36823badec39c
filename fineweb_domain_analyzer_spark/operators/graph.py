"""Link-graph analytics: host-level edge aggregation and fixed-point
PageRank for link-based domain reputation.

The reference engine (``fineweb_analyzer.py``) stops at per-domain
document counts (``analyze_domains``, fineweb_analyzer.py:154-180);
link-based host ranking is the standard next curation step for a web
corpus — Common Crawl publishes host- and domain-level PageRank /
harmonic-centrality ranks for exactly this purpose, and FineWeb-style
pipelines consume them as a quality prior.  This module is therefore a
first-class EXTENSION, not a port.

Scale design
------------
* **Edges are a fact table** (src, dst) built once from per-page
  outlink extraction (at crawl scale: from WAT/HTML href parsing; in
  this sandbox: from a deterministic synthetic generator so tests and
  oracles are exact with no external data).
* **Integer fixed-point arithmetic end to end.**  Ranks are bigints
  scaled by ``scale`` (default 1e6) and every division is an integral
  ``DIV``.  Floating-point PageRank is summation-order dependent —
  the same corpus on 32 cores vs 1000 executors (or Spark vs a SQL
  oracle) drifts in the last ulps and can flip rank-ordered ties.
  Fixed-point makes every iteration bit-exact regardless of
  partitioning, so results are reproducible AND oracle-checkable.
* **Per-iteration cost is one shuffle** (the ``groupBy(dst)``
  contribution sum; partial aggregation is map-side).  The
  edges⋈outdeg frame is computed once outside the loop and persisted;
  each iteration joins the current rank vector onto it by ``src``.
  Hub pages (huge in-degree) are exactly the keys AQE skew-split
  handles; out-degree skew is bounded by per-page link caps upstream.
* **Lineage truncation**: the rank frame is persisted each iteration
  and the previous one unpersisted — after k iterations the plan depth
  is O(1), not O(k), so a 50-iteration production run doesn't blow the
  driver's plan optimizer.
* **Dangling mass** (nodes with no out-links) is folded back uniformly
  each iteration via a 1-row aggregate broadcast — no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Knuth multiplicative-hash constant: spreads synthetic outlink
#: destinations over the doc-id space without clustering.
OUTLINK_MULT = 2654435761
OUTLINK_STEP = 40503


def synthetic_outlinks(
    docs: DataFrame,
    id_col: str = "doc_id",
    host_col: str | None = None,
    n_links: int = 3,
) -> DataFrame:
    """Deterministic per-page outlinks over a contiguous id space.

    dst_j = (id * OUTLINK_MULT + OUTLINK_STEP * j) mod n   (j = 1..k),
    self-links dropped.  Stands in for the crawl-time href extraction
    step (the ids 0..n-1 play the role of a URL dictionary); the
    generator is pure column arithmetic, so it is exactly mirrored in
    the DuckDB oracle.  Returns (src[, src_host], dst).

    The corpus size ``n`` enters the plan as a broadcast 1-row
    aggregate (no driver collect) — at 10^12 docs that count is a
    cheap metadata-only parquet scan.
    """
    n_df = docs.agg(F.count(F.lit(1)).alias("_n"))
    cols = [F.col(id_col).alias("src")]
    if host_col is not None:
        cols.append(F.col(host_col).alias("src_host"))
    raw = (
        docs.select(*cols)
        .crossJoin(F.broadcast(n_df))
        .select(
            "*",
            F.explode(
                F.array(*[F.lit(j) for j in range(1, n_links + 1)])
            ).alias("_j"),
        )
        .withColumn(
            "dst",
            (
                F.col("src") * F.lit(OUTLINK_MULT)
                + F.lit(OUTLINK_STEP) * F.col("_j")
            )
            % F.col("_n"),
        )
    )
    out_cols = ["src"] + (["src_host"] if host_col is not None else []) + ["dst"]
    return raw.where(F.col("dst") != F.col("src")).select(*out_cols)


def host_graph(
    edges: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "source",
) -> DataFrame:
    """Aggregate a page-level edge list to a weighted host graph.

    One shuffle join labels the destination endpoint with its host
    (the source endpoint's host is expected to already travel with the
    edge from extraction — ``synthetic_outlinks(host_col=...)`` — so
    only ONE of the two label joins is ever needed), then one
    aggregation produces (src_host, dst_host, n_links).
    """
    dst_hosts = docs.select(
        F.col(id_col).alias("dst"), F.col(host_col).alias("dst_host")
    )
    labeled = edges.join(dst_hosts, "dst")
    return labeled.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links")
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    scale: int = 1_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
    src: str = "src",
    dst: str = "dst",
    persist: bool = True,
) -> DataFrame:
    """Fixed-point PageRank over an edge list; returns (node, rank).

    Per-node formulation with ranks scaled by ``scale``::

        r0(v)    = scale                      (i.e. 1.0)
        r_k+1(v) = teleport
                   + (damping_num * (sum_{u->v} r_k(u) DIV outdeg(u)
                                     + dangling_k DIV n)) DIV damping_den

    where ``teleport = scale * (den - num) DIV den`` and
    ``dangling_k`` is the summed rank of nodes with no out-links,
    redistributed uniformly.  Every operation is bigint — see module
    docstring for why fixed-point is the scale-correct choice.

    Multigraph semantics: ``outdeg`` counts edges, and each edge
    carries one contribution (parallel edges weigh double).  This is
    deliberate — host graphs keep link multiplicity as edge weight.
    """
    edges = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    # out-degree travels ON the rank vector: dangling detection is a
    # filter and the per-edge contribution division needs no extra
    # join — the loop body is exactly one join + one agg + one
    # rebuild per iteration.
    node_deg = nodes.join(outdeg, "node", "left").select(
        "node", F.coalesce("outdeg", F.lit(0)).cast("long").alias("outdeg")
    )
    if persist:
        edges = edges.persist()
        node_deg = node_deg.persist()
    n_df = node_deg.agg(F.count(F.lit(1)).alias("_n"))
    teleport = scale * (damping_den - damping_num) // damping_den

    ranks = node_deg.select(
        "node", "outdeg", F.lit(scale).cast("long").alias("rank")
    )
    prev = None
    for _ in range(n_iter):
        dang = ranks.where(F.col("outdeg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("_dang")
        )
        contribs = edges.join(ranks, edges["src"] == ranks["node"]).select(
            "dst", F.expr("rank DIV outdeg").alias("contrib")
        )
        incoming = contribs.groupBy("dst").agg(F.sum("contrib").alias("in_sum"))
        new_ranks = (
            node_deg.join(incoming, node_deg["node"] == incoming["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                "outdeg",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_num} * (coalesce(in_sum, 0L)"
                        f" + _dang DIV _n)) DIV {damping_den}"
                    )
                ).cast("long").alias("rank"),
            )
        )
        if persist:
            new_ranks = new_ranks.persist()
            new_ranks.count()  # materialize: truncate lineage, free prev
            if prev is not None:
                prev.unpersist()
            prev = new_ranks
        ranks = new_ranks
    return ranks.select("node", "rank")


def outlink_edges_from_html(
    df: DataFrame, html_col: str = "html", src_host_col: str = "source"
) -> DataFrame:
    """(src_host, dst_host) page-level edges by REAL href extraction:
    ``regexp_extract_all`` → explode → netloc-lower, all codegen map
    stages. The explode multiplies rows by the per-page link count but
    introduces NO shuffle; links without an absolute scheme (relative
    hrefs, fragments) extract an empty netloc and are dropped. The
    src-host label travels with the edge from extraction, so a
    downstream host rollup needs no src-side join (the same property
    ``synthetic_outlinks(host_col=...)`` provides)."""
    from fineweb_domain_analyzer_spark.functions.html import extract_hrefs

    ex = df.select(
        F.col(src_host_col).alias("src_host"),
        F.explode(extract_hrefs(F.col(html_col))).alias("_href"),
    )
    dst = F.lower(
        F.regexp_extract(
            F.col("_href"), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)", 1
        )
    )
    return ex.select("src_host", dst.alias("dst_host")).filter(
        F.col("dst_host") != ""
    )
