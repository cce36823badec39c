"""C4 line cleaning, Gopher dup-line fraction, and IVF ANN tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from fineweb_domain_analyzer_spark.operators.similarity import (
    brute_force_topk,
    deterministic_centroids,
    ivf_topk,
)
from fineweb_domain_analyzer_spark.operators.textclean import (
    c4_clean_text,
    dup_line_fraction,
    with_line_clean,
)

DOC = (
    "A real sentence with plenty of words in it.\n"
    "no punctuation here at all\n"
    "Enable javascript to continue.\n"
    "We use cookie tracking everywhere.\n"
    "Short.\n"
    "   \n"
    "Another proper sentence follows right here!\n"
    "no punctuation here at all\n"
)


def test_c4_clean_keeps_only_valid_lines(spark):
    df = spark.createDataFrame([(1, DOC)], ["doc_id", "text"])
    out = df.select(c4_clean_text(F.col("text")).alias("c")).collect()[0]["c"]
    assert out == (
        "A real sentence with plenty of words in it.\n"
        "Another proper sentence follows right here!"
    )


def test_dup_line_fraction(spark):
    df = spark.createDataFrame([(1, DOC), (2, "one\ntwo\nthree"), (3, "")],
                               ["doc_id", "text"])
    got = {
        r["doc_id"]: r["f"]
        for r in df.select(
            "doc_id", dup_line_fraction(F.col("text")).alias("f")
        ).collect()
    }
    # DOC: 7 non-empty lines, 6 distinct -> 1 - 6/7
    assert abs(got[1] - round(1 - 6 / 7, 4)) < 1e-9
    assert got[2] == 0.0
    assert got[3] == 0.0


def test_with_line_clean_counts(spark):
    df = spark.createDataFrame([(1, DOC)], ["doc_id", "text"])
    row = with_line_clean(df).collect()[0]
    assert row["lines_total"] == 7
    assert row["lines_kept"] == 2
    assert row["cleaned_text"].count("\n") == 1


def test_ivf_assignment_covers_all_and_matches_brute_force_in_cluster(spark, sf_dir):
    emb = spark.read.parquet(str(sf_dir / "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 5)
    got = ivf_topk(queries, emb, k=3, n_centroids=4)
    rows = got.collect()
    # every query returns ranked neighbors with rk dense from 1
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rks = sorted(x["rk"] for x in rs)
        assert rks == list(range(1, len(rks) + 1))
        # IVF neighbors are a subset of brute-force candidates: each
        # IVF cosine must equal the brute-force cosine for that pair
        assert all(x["cos"] <= 1.0 + 1e-9 for x in rs)
    bf = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in brute_force_topk(queries, emb, k=500).collect()
    }
    for r in rows:
        assert abs(bf[(r["query_id"], r["neighbor_id"])] - r["cos"]) < 1e-6


def test_deterministic_centroids(spark, sf_dir):
    emb = spark.read.parquet(str(sf_dir / "embeddings.parquet"))
    cents = deterministic_centroids(emb, 4).collect()
    assert sorted(c["centroid_id"] for c in cents) == [0, 1, 2, 3]


class TestParagraphDedup:
    def test_boilerplate_removed_order_kept(self, spark):
        from fineweb_domain_analyzer_spark.operators.textclean import (
            paragraph_dedup,
        )

        boiler = "accept all cookies"
        rows = [
            (1, [boiler, "alpha", "beta"]),
            (2, ["gamma", boiler]),
            (3, [boiler, "delta", boiler]),
            (4, ["epsilon"]),
        ]
        df = spark.createDataFrame(rows, "doc_id long, paras array<string>")
        out = {
            r["doc_id"]: (r["n_paras"], r["n_removed"], r["cleaned_text"])
            for r in paragraph_dedup(df, "paras", min_doc_freq=3).collect()
        }
        # boiler appears in 3 distinct docs -> removed everywhere,
        # including BOTH occurrences in doc 3; order preserved in doc 1
        assert out[1] == (3, 1, "alpha\nbeta")
        assert out[2] == (2, 1, "gamma")
        assert out[3] == (3, 2, "delta")
        assert out[4] == (1, 0, "epsilon")

    def test_all_removed_yields_empty_text(self, spark):
        from fineweb_domain_analyzer_spark.operators.textclean import (
            paragraph_dedup,
        )

        df = spark.createDataFrame(
            [(i, ["same"]) for i in range(5)],
            "doc_id long, paras array<string>",
        )
        out = paragraph_dedup(df, "paras", min_doc_freq=3).collect()
        assert all(r["cleaned_text"] == "" and r["n_removed"] == 1 for r in out)

    def test_q51_omits_blank_docs_like_oracle(self, spark, tmp_path):
        """ADVICE r3 regression: a blank / whitespace-only doc must be
        omitted from q51's output (the oracle's length(trim(text))=0
        guard yields no paragraphs, hence no row), not emitted as one
        empty paragraph. Checked engine-vs-DuckDB on a corpus that
        actually contains blank docs."""
        import duckdb

        from fineweb_domain_analyzer_spark.queries import (
            Q51_SQL,
            q51_paragraph_dedup,
        )

        rows = [
            (1, "alpha beta gamma delta"),
            (2, ""),  # blank
            (3, "   \n\t  "),  # whitespace-only
            (4, "alpha beta gamma"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pq = str(tmp_path / "documents.parquet")
        docs.coalesce(1).write.parquet(pq)

        got = {
            r["doc_id"]: (r["n_paras"], r["n_removed"], r["cleaned_text"])
            for r in q51_paragraph_dedup(spark, str(tmp_path)).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')"
        )
        want = {
            r[0]: (r[1], r[2], r[3]) for r in con.execute(Q51_SQL).fetchall()
        }
        # the truly-blank doc is omitted by BOTH sides (the r3 bug was
        # the engine emitting it); doc 3 survives both — trim() strips
        # only spaces in Spark AND DuckDB, so "\n\t" is one odd token —
        # what matters is the two sides agree row-for-row.
        assert 2 not in got
        assert 1 in got and 4 in got
        assert got == want


class TestInDocParagraphDedupSeparator:
    def test_regex_metachar_separator(self, spark):
        """sep goes to F.split (regex semantics) but F.array_join
        (literal): metacharacter separators like '|' must split on the
        literal byte, not on every position."""
        from fineweb_domain_analyzer_spark.operators.textclean import (
            with_paragraph_dedup_in_doc,
        )

        df = spark.createDataFrame(
            [(1, "alpha|beta|alpha|gamma")], ["doc_id", "text"]
        )
        row = with_paragraph_dedup_in_doc(df, sep="|").collect()[0]
        assert row["clean_text"] == "alpha|beta|gamma"
        assert row["n_paras_removed"] == 1

    def test_dot_separator(self, spark):
        from fineweb_domain_analyzer_spark.operators.textclean import (
            with_paragraph_dedup_in_doc,
        )

        df = spark.createDataFrame([(1, "aa.bb.aa.cc")], ["doc_id", "text"])
        row = with_paragraph_dedup_in_doc(df, sep=".").collect()[0]
        assert row["clean_text"] == "aa.bb.cc"
        assert row["n_paras_removed"] == 1


class TestDomainBoilerplate:
    """domain_boilerplate_removal: per-site df-ratio strip (q94)."""

    def _run(self, spark, rows, **kw):
        from fineweb_domain_analyzer_spark.operators.textclean import (
            domain_boilerplate_removal,
        )

        df = spark.createDataFrame(
            rows, "doc_id long, source string, paras array<string>"
        )
        return {
            (r["source"], r["doc_id"]): (
                r["n_paras"], r["n_removed"], r["cleaned_text"]
            )
            for r in domain_boilerplate_removal(
                df, "paras", domain_col="source", **kw
            ).collect()
        }

    def test_domain_scoped_not_cross_domain(self, spark):
        # "nav" covers 2/2 docs on site A (>=50% and >=2 docs -> strip)
        # but only 1/3 docs on site B (df=1 < min_doc_freq -> keep):
        # the SAME paragraph is boilerplate on one site, content on the
        # other — the exact property the corpus-wide q51 cannot express.
        out = self._run(
            spark,
            [
                (1, "a.com", ["nav", "alpha"]),
                (2, "a.com", ["beta", "nav"]),
                (3, "b.com", ["nav", "gamma"]),
                (4, "b.com", ["delta"]),
                (5, "b.com", ["epsilon"]),
            ],
        )
        assert out[("a.com", 1)] == (2, 1, "alpha")
        assert out[("a.com", 2)] == (2, 1, "beta")
        assert out[("b.com", 3)] == (2, 0, "nav\ngamma")
        assert out[("b.com", 4)] == (1, 0, "delta")
        assert out[("b.com", 5)] == (1, 0, "epsilon")

    def test_ratio_threshold_boundary_exact(self, spark):
        # 4-doc domain, min_ratio_bp=5000: df=2 -> 2*10000 >= 5000*4
        # holds with equality (strip); df=1 fails min_doc_freq. A float
        # comparison could wobble on the equality case — the integer
        # form cannot.
        out = self._run(
            spark,
            [
                (1, "c.com", ["footer", "x1"]),
                (2, "c.com", ["footer", "x2"]),
                (3, "c.com", ["x3"]),
                (4, "c.com", ["x4"]),
            ],
        )
        assert out[("c.com", 1)] == (2, 1, "x1")
        assert out[("c.com", 2)] == (2, 1, "x2")

    def test_below_ratio_kept(self, spark):
        # df=2 of 5 docs = 4000 bp < 5000 bp -> kept everywhere even
        # though min_doc_freq is met.
        rows = [(i, "d.com", ["promo", f"body{i}"]) for i in (1, 2)] + [
            (i, "d.com", [f"body{i}"]) for i in (3, 4, 5)
        ]
        out = self._run(spark, rows)
        assert out[("d.com", 1)] == (2, 0, "promo\nbody1")
        assert out[("d.com", 2)] == (2, 0, "promo\nbody2")

    def test_repeat_within_one_doc_is_not_df(self, spark):
        # doc-frequency counts DISTINCT docs: the same para twice in
        # one doc of a 2-doc domain is df=1 -> kept (in-doc repeats are
        # q71's job, not this operator's).
        out = self._run(
            spark,
            [
                (1, "e.com", ["hdr", "mid", "hdr"]),
                (2, "e.com", ["other"]),
            ],
        )
        assert out[("e.com", 1)] == (3, 0, "hdr\nmid\nhdr")

    def test_q94_matches_duckdb_oracle(self, spark, sf_dir):
        import duckdb

        from fineweb_domain_analyzer_spark import queries as q

        got = sorted(
            (
                (r["doc_id"], r["source"], r["n_paras"], r["n_removed"],
                 r["cleaned_text"])
                for r in q.q94_domain_boilerplate(
                    spark, str(sf_dir)
                ).collect()
            )
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        want = sorted(tuple(t) for t in con.execute(q.Q94_SQL).fetchall())
        assert got == want
