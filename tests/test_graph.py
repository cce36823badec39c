"""Link-graph operators: synthetic outlinks, host graph, fixed-point
PageRank (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fineweb_domain_analyzer_spark.operators.graph import (
    host_graph,
    pagerank,
    synthetic_outlinks,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_synthetic_outlinks_shape(spark):
    docs = spark.range(40).withColumnRenamed("id", "doc_id")
    edges = synthetic_outlinks(docs, n_links=3).toPandas()
    assert ((edges.src != edges.dst)).all()
    assert edges.dst.between(0, 39).all()
    deg = edges.groupby("src").size()
    assert set(deg.index) == set(range(40))  # every doc is a src
    assert deg.between(2, 3).all()  # at most one self-link dropped


def test_synthetic_outlinks_carries_host(spark):
    docs = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("h"), (F.col("id") % 3).cast("string")).alias("source"),
    )
    edges = synthetic_outlinks(docs, host_col="source")
    assert edges.columns == ["src", "src_host", "dst"]
    row = edges.where(F.col("src") == 4).first()
    assert row.src_host == "h1"


def test_host_graph_counts(spark):
    docs = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b")], "doc_id long, source string"
    )
    edges = spark.createDataFrame(
        [(0, "a", 2), (1, "a", 2), (0, "a", 1), (2, "b", 0)],
        "src long, src_host string, dst long",
    )
    hg = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_graph(edges, docs).collect()
    }
    assert hg == {("a", "b"): 2, ("a", "a"): 1, ("b", "a"): 1}


def test_pagerank_hand_computed_one_iteration(spark):
    # A(0)->B(1); B->A, B->C(2); C dangling.  Integer math by hand:
    #   teleport = 150000, dang_share = 1_000_000 // 3 = 333333
    #   rA = 150000 + (85*(500000+333333))//100  = 858333
    #   rB = 150000 + (85*(1000000+333333))//100 = 1283333
    #   rC = rA
    edges = _edges(spark, [(0, 1), (1, 0), (1, 2)])
    got = {
        r.node: r.rank
        for r in pagerank(edges, n_iter=1, persist=False).collect()
    }
    assert got == {0: 858333, 1: 1283333, 2: 858333}


def test_pagerank_partitioning_invariant(spark):
    docs = spark.range(60).withColumnRenamed("id", "doc_id")
    edges = synthetic_outlinks(docs)
    a = {
        r.node: r.rank
        for r in pagerank(edges.repartition(7), n_iter=3, persist=False).collect()
    }
    b = {
        r.node: r.rank
        for r in pagerank(edges.repartition(2), n_iter=3, persist=False).collect()
    }
    assert a == b  # bigint fixed-point: bit-exact under any partitioning


def test_pagerank_sink_attracts_mass(spark):
    # star: everyone links to node 0; node 0 links to node 1.
    edges = _edges(spark, [(1, 0), (2, 0), (3, 0), (0, 1)])
    got = {r.node: r.rank for r in pagerank(edges, n_iter=3).collect()}
    assert got[0] == max(got.values())
    assert got[2] == got[3]  # symmetric nodes stay exactly tied


class TestOutlinkExtraction:
    """extract_hrefs + outlink_edges_from_html: the real href machinery
    behind q105 (q97's synthetic generator stands in only for the
    target-id arithmetic; extraction itself is exercised here)."""

    def test_extract_hrefs_in_order(self, spark):
        from fineweb_domain_analyzer_spark.functions.html import extract_hrefs

        html = (
            '<a href="https://a.com/x">1</a>'
            "<p>noise</p>"
            '<a class="nav" href="https://b.com/y?q=1#frag">2</a>'
            '<a href="/relative">3</a>'
            "<a href='https://single-quoted.com'>ignored</a>"
        )
        df = spark.createDataFrame([(html,)], "html string")
        got = df.select(extract_hrefs(F.col("html")).alias("h")).collect()[0]["h"]
        assert got == [
            "https://a.com/x",
            "https://b.com/y?q=1#frag",
            "/relative",
        ]

    def test_edges_drop_relative_and_label_src(self, spark):
        from fineweb_domain_analyzer_spark.operators.graph import (
            outlink_edges_from_html,
        )

        df = spark.createDataFrame(
            [
                (
                    "src0",
                    '<a href="https://H1.Example.com/a">x</a>'
                    '<a href="/rel">r</a>'
                    '<a href="http://h2.example.com:8080/b">y</a>',
                ),
                ("src1", "<p>no links at all</p>"),
            ],
            "source string, html string",
        )
        edges = outlink_edges_from_html(df).collect()
        got = sorted((r["src_host"], r["dst_host"]) for r in edges)
        # netloc is lowered; the port is cut by the netloc char class;
        # relative href and link-free pages contribute nothing
        assert got == [("src0", "h1.example.com"), ("src0", "h2.example.com")]

    def test_q105_no_src_side_join(self, spark):
        """One shuffle total: the edge rollup. No join anywhere in the
        plan (the src label travels with the edge from extraction)."""
        from fineweb_domain_analyzer_spark.queries import q105_outlink_graph

        plan = (
            q105_outlink_graph(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Join" not in plan
        assert plan.count("Exchange") <= 2  # partial/final agg pair


class TestAnchorText:
    def test_pairs_and_scope(self, spark):
        from fineweb_domain_analyzer_spark.functions.html import (
            extract_anchors,
        )

        html = (
            '<a href="https://a.com/x">read this</a>'
            '<a id="i" href="/rel">home</a>'
            '<a href="https://b.com"><b>nested markup skipped</b></a>'
            '<a href="https://c.com"></a>'
        )
        df = spark.createDataFrame([(html,)], "html string")
        got = [
            (r["href"], r["text"])
            for r in df.select(
                F.explode(extract_anchors(F.col("html"))).alias("a")
            ).select("a.href", "a.text").collect()
        ]
        assert got == [
            ("https://a.com/x", "read this"),
            ("/rel", "home"),
            ("https://c.com", ""),
        ]

    def test_q108_zero_exchanges(self, spark):
        from fineweb_domain_analyzer_spark.queries import q108_anchor_text

        plan = (
            q108_anchor_text(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
