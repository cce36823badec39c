"""Embedding ANN tests on the driver's embeddings table."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fineweb_domain_analyzer_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    lsh_bucketed_topk,
    make_cosine_scores_pandas_udf,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(str(sf_dir / "embeddings.parquet")).cache()


def test_cosine_expression(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 0.0])],
        ["a", "b"],
    )
    got = [r["c"] for r in df.select(F.round(cosine(F.col("a"), F.col("b")), 6).alias("c")).collect()]
    assert got[0] == 1.0
    assert got[1] == 0.0
    assert abs(got[2] - 1 / math.sqrt(2)) < 1e-6


def test_brute_force_topk(emb):
    queries = emb.filter(F.col("vec_id") < 3)
    out = brute_force_topk(queries, emb, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        assert len(rows) == 5
        cs = [r["cos"] for r in sorted(rows, key=lambda r: r["rk"])]
        assert cs == sorted(cs, reverse=True)
        assert all(r["neighbor_id"] != q for r in rows)


def test_lsh_recall_vs_brute_force(emb):
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(queries, emb, k=5).collect()
    approx = lsh_bucketed_topk(queries, emb, k=5, n_planes=4).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    # LSH results must be a plausible approximation: every approx
    # neighbor is a real candidate and recall is nonzero.
    assert approx_set
    recall = len(exact_set & approx_set) / len(exact_set)
    # sign-LSH on near-uniform random vectors has modest single-probe
    # recall; this guards "the bucketing actually restricts + still
    # finds true neighbors", not a production recall target (bench
    # reports the real recall/speed tradeoff).
    assert recall > 0.05, recall


def test_embedding_near_dups(spark):
    from fineweb_domain_analyzer_spark.operators.similarity import embedding_near_dups

    rows = [
        (0, [1.0] * 16),
        (1, [1.0] * 15 + [1.01]),  # near-identical to 0
        (2, [-1.0] * 16),          # opposite
        (3, [1.0, -1.0] * 8),      # orthogonal-ish
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["id_a"], r["id_b"]): r["cos"] for r in embedding_near_dups(df, 0.95, n_planes=4).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.99
    assert all(a != 2 and b != 2 for a, b in pairs)


def test_pandas_cosine_matches_sql(emb, spark):
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]
    udf = make_cosine_scores_pandas_udf([float(x) for x in qrow["embedding"]])
    sample = emb.filter(F.col("vec_id") < 20)
    qdf = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("_qv")
    )
    sql_scores = {
        r["vec_id"]: r["c"]
        for r in sample.crossJoin(F.broadcast(qdf))
        .select("vec_id", F.round(cosine(F.col("_qv"), F.col("embedding")), 6).alias("c"))
        .collect()
    }
    udf_scores = {
        r["vec_id"]: round(r["c"], 6)
        for r in sample.select("vec_id", udf(F.col("embedding")).alias("c")).collect()
    }
    for k in sql_scores:
        assert abs(sql_scores[k] - udf_scores[k]) < 1e-5


def test_lsh_multiprobe_recall_superset(spark, sf_dir):
    """Hamming-1 multi-probe must find everything the single-bucket
    probe finds (its probe set includes the exact bucket)."""
    from fineweb_domain_analyzer_spark.operators.similarity import (
        lsh_bucketed_topk,
    )

    emb = spark.read.parquet(str(sf_dir / "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 5)
    # k >= corpus so no truncation: candidate SETS must nest
    big_k = emb.count()
    base = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_bucketed_topk(queries, emb, k=big_k, n_planes=4).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_bucketed_topk(
            queries, emb, k=big_k, n_planes=4, multi_probe=True
        ).collect()
    }
    assert base <= multi
    assert len(multi) >= len(base)


def test_random_plane_bucket_groups_near_duplicates(spark):
    """Seeded gaussian planes: identical vectors share a bucket, a
    slightly-perturbed copy lands in the same bucket, and the bucketed
    top-k finds it (the production plane family, VERDICT r1 item 7)."""
    from fineweb_domain_analyzer_spark.operators.similarity import (
        lsh_bucketed_topk,
        plane_bucket,
        random_planes,
    )

    base = [1.0, -2.0, 0.5, 3.0, -1.0, 0.25, 2.0, -0.5]
    near = [x + 0.01 for x in base]
    far = [-x for x in base]
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far), (3, [0.0] * 7 + [5.0])],
        "vec_id bigint, embedding array<double>",
    )
    planes = random_planes(8, 8, seed=42)
    buckets = {
        r["vec_id"]: r["b"]
        for r in df.select(
            "vec_id", plane_bucket(F.col("embedding"), planes).alias("b")
        ).collect()
    }
    assert buckets[0] == buckets[1]  # near-identical -> same bucket
    assert buckets[0] != buckets[2]  # antipodal -> all bits flipped
    # determinism: same seed, same buckets
    buckets2 = {
        r["vec_id"]: r["b"]
        for r in df.select(
            "vec_id",
            plane_bucket(F.col("embedding"), random_planes(8, 8, seed=42)).alias("b"),
        ).collect()
    }
    assert buckets == buckets2
    q = df.filter(F.col("vec_id") == 0)
    out = lsh_bucketed_topk(q, df, k=2, planes=planes).collect()
    assert any(r["neighbor_id"] == 1 and r["rk"] == 1 for r in out)


def test_kmeans_ivf_nprobe(spark):
    """Real k-means centroids + nprobe: nprobe=2 candidates are a
    superset of nprobe=1's, and a query finds its own cluster-mates."""
    import numpy as np

    from fineweb_domain_analyzer_spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids,
    )

    rng = np.random.RandomState(3)
    centers = rng.standard_normal((4, 16))
    pts = np.repeat(centers, 10, axis=0) + 0.1 * rng.standard_normal((40, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in r]) for i, r in enumerate(pts)],
        "vec_id bigint, embedding array<double>",
    )
    kc = kmeans_centroids(df, n_centroids=4, seed=1)
    assert kc.count() == 4
    q = df.filter(F.col("vec_id") == 0)
    top1 = {r["neighbor_id"] for r in ivf_topk(q, df, k=5, centroids_df=kc).collect()}
    top2 = {
        r["neighbor_id"]
        for r in ivf_topk(q, df, k=5, centroids_df=kc, nprobe=2).collect()
    }
    # cluster 0 members are ids 1..9; with clean clusters k-means finds them
    assert top1 <= set(range(1, 10))
    assert len(top1) == 5 and len(top2) == 5


def test_sized_n_planes_rule(spark):
    """The bucket-sizing rule: n_planes grows with the corpus so the
    expected bucket stays ~target — never the fixed-256-bucket trap."""
    from fineweb_domain_analyzer_spark.operators.similarity import sized_n_planes

    assert sized_n_planes(1_000, target_bucket_size=128) == 4  # lo clamp
    assert sized_n_planes(100_000, target_bucket_size=128) == 10
    assert sized_n_planes(10**9, target_bucket_size=128) == 23
    assert sized_n_planes(10**15, target_bucket_size=128) == 30  # hi clamp
    # expected bucket size stays ~target across 4 orders of magnitude
    for n in (10**5, 10**7, 10**9):
        planes = sized_n_planes(n, target_bucket_size=128)
        assert 64 <= n / 2**planes <= 256


def test_candidate_fraction_bounded_at_two_corpus_sizes(spark):
    """The scale property the fixed default lacked: with auto-sizing,
    CANDIDATE PAIRS PER VECTOR must stay bounded as the corpus grows
    (fixed n_planes would double pairs-per-vector with each corpus
    doubling). Random unit-ish vectors, tiny target bucket so the rule
    engages at test scale."""
    import numpy as np

    from fineweb_domain_analyzer_spark.operators.similarity import (
        embedding_near_dups,
        sized_n_planes,
    )

    def pairs_per_vec(n: int) -> float:
        rng = np.random.RandomState(7)
        vecs = rng.standard_normal((n, 64))
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id bigint, embedding array<double>",
        )
        cnt = embedding_near_dups(
            df, threshold=-1.0, corpus_size=n, target_bucket_size=8
        ).count()
        return cnt / n

    small, large = pairs_per_vec(256), pairs_per_vec(1024)
    assert sized_n_planes(1024, 8) > sized_n_planes(256, 8)
    # threshold -1 keeps EVERY candidate, so this measures raw candidate
    # volume: within 3x despite a 4x corpus (fixed planes would give ~4x)
    assert large <= small * 3, (small, large)


def test_banded_near_dups_recall_beats_single_band(spark):
    """OR-construction recall: planted near-identical pairs missed by a
    single 8-bit key are recovered by 2x4-bit bands (any-band match),
    and banded results are exact-cosine verified (no false positives
    below threshold)."""
    import numpy as np

    from fineweb_domain_analyzer_spark.operators.similarity import (
        embedding_near_dups,
    )

    rng = np.random.RandomState(11)
    base = rng.standard_normal((80, 64))
    jitter = base + 0.15 * rng.standard_normal((80, 64))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows += [(i + 1000, [float(x) for x in v]) for i, v in enumerate(jitter)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    planted = {(i, i + 1000) for i in range(80)}

    def found(**kw):
        return {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dups(df, threshold=0.9, **kw).collect()
        } & planted

    single = found(n_planes=8, bands=1)
    banded = found(n_planes=4, bands=2)
    assert len(banded) > len(single), (len(single), len(banded))
    assert len(banded) >= 0.9 * len(planted)


class TestSemanticDedupComposition:
    def test_planted_clusters_keep_canonical(self, spark):
        """Two planted near-identical embedding groups + isolated
        vectors: the q54 composition (near-dup pairs -> CC -> canonical)
        must keep exactly the min id of each group."""
        import math

        from fineweb_domain_analyzer_spark.operators.dedup import (
            connected_components,
        )
        from fineweb_domain_analyzer_spark.operators.similarity import (
            embedding_near_dups,
        )
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        dim = 16

        def unit(axis, eps=0.0):
            v = [0.0] * dim
            v[axis] = 1.0
            v[(axis + 1) % dim] = eps
            n = math.sqrt(sum(x * x for x in v))
            return [x / n for x in v]

        rows = (
            [(i, unit(0, 0.01 * i)) for i in range(1, 4)]      # cluster A
            + [(i, unit(5, 0.01 * i)) for i in range(10, 13)]  # cluster B
            + [(100, unit(9)), (101, unit(12))]                # isolated
        )
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        pairs = embedding_near_dups(
            emb, threshold=0.95, n_planes=8, id_col="vec_id"
        )
        cc = connected_components(pairs)
        out = cc.withColumn(
            "kept", F.col("node") == F.col("cluster_id")
        ).collect()
        clusters = {}
        for r in out:
            clusters.setdefault(r["cluster_id"], set()).add(r["node"])
        assert clusters == {1: {1, 2, 3}, 10: {10, 11, 12}}
        kept = {r["node"] for r in out if r["kept"]}
        assert kept == {1, 10}


class TestEmbeddingOutliers:
    """embedding_outliers: IVF assignment + banded per-cluster
    percentile (q96)."""

    def test_planted_outlier_flagged(self, spark):
        from fineweb_domain_analyzer_spark.operators.similarity import (
            embedding_outliers,
        )

        # 2 centroids (lowest ids): [1,0] and [0,1]. 20 vectors hug
        # centroid 0 with tiny jitter; one vector (id 99) points near
        # the [1,0]/[0,1] diagonal but closer to [1,0] -> same cluster,
        # far from it. With n_bands_ntile=20 and 21 members, band 1
        # holds exactly the 2 lowest-cos rows (ntile puts ceil(21/20)=2
        # in band 1) -> the planted outlier must be in band 1.
        rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
        rows += [(i, [1.0, 0.001 * i]) for i in range(2, 21)]
        rows += [(99, [1.0, 0.9])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = {
            r["vec_id"]: (r["cluster_id"], r["band"], r["is_outlier"])
            for r in embedding_outliers(df, n_centroids=2).collect()
        }
        assert out[99][0] == 0          # assigned to [1,0]'s cluster
        assert out[99][1] == 1 and out[99][2] is True
        assert out[1] == (1, 1, True)   # centroid 1's only member
        # the tight cluster members are NOT all outliers
        inliers = [v for k, v in out.items() if k not in (99, 1)]
        assert sum(1 for (_c, _b, o) in inliers if o) <= 1

    def test_band_sizes_are_ntile_exact(self, spark, sf_dir):
        from fineweb_domain_analyzer_spark.operators.similarity import (
            embedding_outliers,
        )

        emb = spark.read.parquet(str(sf_dir / "embeddings.parquet"))
        out = embedding_outliers(emb, n_centroids=8, n_bands_ntile=20)
        sizes = (
            out.groupBy("cluster_id", "band").count()
            .groupBy("cluster_id")
            .agg(
                F.max("count").alias("mx"),
                F.min("count").alias("mn"),
                F.sum("count").alias("n"),
            )
            .collect()
        )
        # ntile invariant: band sizes within a cluster differ by <= 1
        for r in sizes:
            assert r["mx"] - r["mn"] <= 1

    def test_q96_matches_duckdb_oracle(self, spark, sf_dir):
        import duckdb

        from fineweb_domain_analyzer_spark import queries as q

        got = sorted(
            tuple(r) for r in q.q96_embedding_outliers(
                spark, str(sf_dir)
            ).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet')"
        )
        want = sorted(tuple(t) for t in con.execute(q.Q96_SQL).fetchall())
        assert got == want
