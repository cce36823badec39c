"""Embedding similarity search (ANN) over array<float> columns.

Two tiers, as a 100 TB pipeline needs:

* ``brute_force_topk`` — exact cosine top-k: broadcast the (small)
  query set against the candidate table; one map pass + one top-k
  aggregation. Correctness baseline and perfectly adequate when
  |queries| is small.
* ``lsh_bucketed_topk`` — sign-LSH (random-hyperplane-style, but with
  deterministic axis-subset planes so it's reproducible and
  oracle-checkable): candidates are only scored within matching
  buckets. The scale path: bucket key is computed map-side; the join
  is an equi-join on a short key; recall is tuned by n_planes /
  multi-probe unions.

All arithmetic is done JVM-side in double precision via
zip_with + aggregate — no UDF, no Python. For very wide vectors a
pandas UDF with numpy dot can win on constant factors; that variant is
``cosine_topk_pandas`` (Arrow-batched) for completeness.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k. queries is broadcast (must be small);
    candidates streams through one map stage; the only shuffle is the
    per-query top-k window. Output: (query_id, neighbor_id, cos)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("_qv"), F.col("_cv")), 6))
        .drop("_qv", "_cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "rk")
    )


def sign_bucket(vec: Column, n_planes: int = 8) -> Column:
    """Deterministic sign-LSH bucket: bit p = sign(vec[p] - vec[p + n]).

    Axis-difference planes are a degenerate but deterministic family of
    hyperplanes (normal = e_p - e_{p+n}); reproducible in any engine.
    Production would substitute seeded random gaussian planes via a
    broadcast plane matrix — same plan shape, same join.
    """
    bits = [
        F.when(
            F.element_at(vec, p + 1).cast("double")
            >= F.element_at(vec, p + 1 + n_planes).cast("double"),
            F.lit(1 << p),
        ).otherwise(F.lit(0))
        for p in range(n_planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("int")


def sized_n_planes(
    corpus_size: int,
    target_bucket_size: int = 128,
    lo: int = 4,
    hi: int = 30,
) -> int:
    """Scale-aware plane count: n_planes ≈ log2(corpus / target bucket
    size), clamped to [lo, hi].

    With n planes there are 2^n buckets, so the EXPECTED bucket size is
    corpus/2^n; holding that at ``target_bucket_size`` keeps the
    in-bucket self-join O(corpus × target) instead of quadratic. A
    fixed n_planes=8 (256 buckets) is fine at 10^5 vectors and
    quadratic death at 10^9 — this rule is what turns the knob with the
    corpus. hi=30 caps the key inside a positive int32."""
    import math

    spread = max(float(corpus_size), 2.0) / max(target_bucket_size, 1)
    return max(lo, min(hi, math.ceil(math.log2(max(spread, 2.0)))))


def random_planes(n_planes: int, dim: int, seed: int = 42):
    """Seeded gaussian hyperplane normals, (n_planes, dim) — the
    production plane family for sign-LSH. Deterministic given seed."""
    import numpy as np

    return np.random.RandomState(seed).standard_normal((n_planes, dim))


def plane_bucket(vec: Column, planes) -> Column:
    """Sign-LSH bucket from an explicit plane matrix (rows = plane
    normals): bit p = [vec · plane_p ≥ 0].

    The planes are embedded as array literals, so the whole bucket key
    is one JVM-side codegen expression — the moral equivalent of a
    broadcast plane matrix, with zero Python in the hot path. For
    n_planes×dim in the hundreds-of-KB range, switch to a pandas UDF
    with a real broadcast; at 8×64 literals win.
    """
    out = F.lit(0)
    for p, row in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in row])
        out = out + F.when(dot(vec, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return out.cast("int")


def banded_sign_buckets(
    vec: Column, planes_per_band: int, bands: int, planes=None
) -> Column:
    """array<struct<band_id:int, band_key:int>> — ``bands`` independent
    sign-LSH keys of ``planes_per_band`` bits each.

    The MinHash-LSH-style OR-construction for embeddings: a pair is a
    candidate if it matches in ANY band, so recall for near-identical
    vectors is 1-(1-p^r)^b instead of the single-band p^r — the fix for
    sign-LSH's recall collapsing as the sizing rule raises the bit
    count. ``planes``: optional (bands×planes_per_band, dim) matrix
    (e.g. ``random_planes``), sliced per band; None uses the
    oracle-portable axis-difference family — band b bit j compares
    vec[b·r+j] against vec[b·r+j + r·bands] (requires
    2·r·bands ≤ dim; distinct axis pairs across all bands)."""
    r = planes_per_band
    structs = []
    for b in range(bands):
        if planes is not None:
            key = plane_bucket(vec, planes[b * r : (b + 1) * r])
        else:
            out = F.lit(0)
            for j in range(r):
                p = b * r + j
                q = p + r * bands
                out = out + F.when(
                    F.element_at(vec, p + 1).cast("double")
                    >= F.element_at(vec, q + 1).cast("double"),
                    F.lit(1 << j),
                ).otherwise(F.lit(0))
            key = out.cast("int")
        structs.append(
            F.struct(
                F.lit(b).cast("int").alias("band_id"), key.alias("band_key")
            )
        )
    return F.array(*structs)


def lsh_bucketed_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    n_planes: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multi_probe: bool = False,
    planes=None,
    corpus_size: int | None = None,
    target_bucket_size: int = 128,
) -> DataFrame:
    """ANN top-k scored only within the query's sign-LSH bucket(s).
    Approximate: recall < 1; BENCH/ann_recall.json reports recall vs
    the brute-force baseline. Bucket keys are hash-like → uniform
    shuffle.

    ``multi_probe=True`` additionally probes every bucket at hamming
    distance 1 from the query's (flip each plane bit once) — the
    standard recall/cost knob: (n_planes+1)× the candidates without
    touching the candidate-side index. Only the (small) query side
    fans out, so the join stays broadcast.

    ``planes`` (a (n_planes, dim) matrix, e.g. ``random_planes(...)``)
    switches from the oracle-portable axis-difference family to real
    seeded gaussian hyperplanes — the production choice; recall for
    both is measured in BENCH/ann_recall.json.

    ``n_planes=None`` derives the plane count from the candidate-corpus
    size via ``sized_n_planes`` (pass ``corpus_size`` to skip the
    count(*) job, which on parquet is a cheap stats-only scan): the
    expected bucket stays ~``target_bucket_size`` so per-query probe
    cost is O(target), not O(corpus/256)."""
    if planes is not None:
        n_planes = len(planes)

        def _bucket(vec: Column) -> Column:
            return plane_bucket(vec, planes)

    else:
        if n_planes is None:
            n_planes = sized_n_planes(
                corpus_size if corpus_size is not None else candidates.count(),
                target_bucket_size,
            )

        def _bucket(vec: Column) -> Column:
            return sign_bucket(vec, n_planes)

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        _bucket(F.col(vec_col)).alias("_bucket"),
    )
    if multi_probe:
        probes = F.array(
            F.col("_bucket"),
            *[
                F.col("_bucket").bitwiseXOR(F.lit(1 << p)).cast("int")
                for p in range(n_planes)
            ],
        )
        q = (
            q.withColumn("_bucket", F.explode(probes))
        )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        _bucket(F.col(vec_col)).alias("_bucket"),
    )
    scored = (
        c.join(F.broadcast(q), ["_bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("_qv"), F.col("_cv")), 6))
        .drop("_qv", "_cv", "_bucket")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "rk")
    )


def embedding_near_dups(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_planes: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 1,
    planes=None,
    corpus_size: int | None = None,
    target_bucket_size: int = 128,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ threshold).

    The dedup-by-embedding path of a training-data pipeline: sign-LSH
    buckets bound the candidate set (near-identical vectors share all
    sign bits, so recall at high thresholds is excellent), then exact
    cosine verifies. Only the bucket self-join shuffles, keyed by the
    (uniform) bucket hash.

    ``n_planes`` is PER BAND; ``None`` derives it from the corpus size
    via ``sized_n_planes`` (pass ``corpus_size`` to skip the count(*)
    job) so the expected bucket stays ~``target_bucket_size`` as the
    corpus grows — a fixed 8-plane default is 256 buckets forever and
    quadratic in-bucket at web scale.

    ``bands > 1`` switches to the MinHash-LSH-style OR-construction
    (``banded_sign_buckets``): b independent r-bit keys, candidate on
    ANY band match — the recall knob that compensates for the sizing
    rule raising r. ``planes``: optional (bands×n_planes, dim) gaussian
    matrix for the production plane family."""
    if n_planes is None:
        n_planes = sized_n_planes(
            corpus_size if corpus_size is not None else vectors.count(),
            target_bucket_size,
        )
    if bands <= 1 and planes is None:
        bucket = sign_bucket(F.col(vec_col), n_planes).alias("_b")
        v = vectors.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), bucket
        )
        join_key = ["_b"]
    else:
        v = vectors.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            F.explode(
                banded_sign_buckets(F.col(vec_col), n_planes, bands, planes)
            ).alias("_bb"),
        ).select("_id", "_v", "_bb.band_id", "_bb.band_key")
        join_key = ["band_id", "band_key"]
    l, r = v.alias("l"), v.alias("r")
    cond = F.col("l._id") < F.col("r._id")
    for kcol in join_key:
        cond = (F.col(f"l.{kcol}") == F.col(f"r.{kcol}")) & cond
    pairs = l.join(r, cond).select(
        F.col("l._id").alias("id_a"),
        F.col("r._id").alias("id_b"),
        F.round(cosine(F.col("l._v"), F.col("r._v")), 6).alias("cos"),
    )
    if bands > 1:
        # a pair matching in several bands appears once per band; cos is
        # deterministic, so id-level distinct dedups without re-keying
        pairs = pairs.distinct()
    return pairs.filter(F.col("cos") >= threshold)


def deterministic_centroids(
    vectors: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic centroid set: the `n_centroids` lowest-id vectors.

    Stand-in for k-means "training" so the IVF index is reproducible and
    oracle-checkable; production swaps this for
    ``pyspark.ml.clustering.KMeans`` centroids — the assignment and
    search plans below are unchanged (they only see a small centroid
    DataFrame, which is broadcast either way).

    Takes the n LOWEST ids actually present (orderBy + limit), not
    ``id < n`` — id spaces that don't start at 0 must still yield a
    full centroid set rather than a silently empty index.
    """
    return vectors.orderBy(F.col(id_col)).limit(n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
    )


def kmeans_centroids(
    vectors: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
) -> DataFrame:
    """REAL k-means centroids via pyspark.ml (Lloyd's, distributed,
    seeded) — the production IVF "training" step. Returns the same
    (centroid_id, centroid_vec) shape as deterministic_centroids, so
    the assignment/search plans are interchangeable. Not
    oracle-checkable (k-means has no single-statement SQL mirror), so
    the driver queries keep the deterministic variant; the recall bench
    measures this one."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = vectors.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(feats)
    spark = vectors.sparkSession
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    return spark.createDataFrame(
        rows, "centroid_id int, centroid_vec array<double>"
    )


def assign_ivf_cluster(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, cluster_id): nearest centroid by cosine, ties → lowest
    centroid id. The nprobe=1 case of assign_ivf_clusters_topn (single
    source of truth for the scoring + 6dp-round + tie-break logic, which
    the q32 oracle mirrors exactly)."""
    return assign_ivf_clusters_topn(vectors, centroids, 1, id_col, vec_col)


def assign_ivf_clusters_topn(
    vectors: DataFrame,
    centroids: DataFrame,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, cluster_id) with one row per probed cluster — the
    nprobe nearest centroids by cosine. nprobe=1 degenerates to
    assign_ivf_cluster."""
    scored = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "_cc", F.round(cosine(F.col(vec_col), F.col("centroid_vec")), 6)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_cc").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= nprobe)
        .select(F.col(id_col), F.col(vec_col), F.col("centroid_id").alias("cluster_id"))
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
    centroids_df: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN: score only candidates in the query's nprobe nearest
    cluster(s).

    The scale path: the candidate table is partitioned by cluster_id
    once (in production: written bucketed/partitioned by cluster so the
    probe is a partition-pruned scan), queries are broadcast, and each
    query touches nprobe × |corpus| / n_centroids candidates.
    Approximate — recall vs brute force is reported by the bench.
    ``centroids_df`` accepts real k-means centroids (kmeans_centroids);
    default is the deterministic oracle-checkable set. Output:
    (query_id, neighbor_id, cos, rk)."""
    centroids = (
        centroids_df
        if centroids_df is not None
        else deterministic_centroids(candidates, n_centroids, id_col, vec_col)
    )
    cand = assign_ivf_cluster(candidates, centroids, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        "cluster_id",
    )
    qry = assign_ivf_clusters_topn(
        queries, centroids, nprobe, id_col, vec_col
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        "cluster_id",
    )
    scored = (
        cand.join(F.broadcast(qry), ["cluster_id"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("_qv"), F.col("_cv")), 6))
        .drop("_qv", "_cv", "cluster_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "rk")
    )


def make_cosine_scores_pandas_udf(query_vec: list[float]):
    """Arrow-batched numpy cosine against one fixed query vector —
    the constant-factor-optimized path for very wide embeddings."""
    import numpy as np

    qv = np.asarray(query_vec, dtype="float64")
    qn = float(np.linalg.norm(qv))

    @pandas_udf(DoubleType())
    def cosine_vs_query(embs: pd.Series) -> pd.Series:
        mat = np.stack(embs.map(lambda v: np.asarray(v, dtype="float64")).to_list())
        sims = mat @ qv / (np.linalg.norm(mat, axis=1) * qn)
        return pd.Series(sims)

    return cosine_vs_query


def embedding_outliers(
    vectors: DataFrame,
    n_centroids: int = 8,
    n_bands_ntile: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids_df: DataFrame | None = None,
) -> DataFrame:
    """Embedding-space OUTLIER detection: assign every vector to its
    nearest centroid (cosine, 6dp round, lowest-centroid tie-break —
    the exact assignment q32's IVF index uses), then flag the vectors
    farthest from their own centroid: per-cluster exact
    ``ntile(n_bands_ntile)`` over (cos asc, id asc); band 1 is the
    most-dissimilar 1/n slice (5% at the default 20).  The classic
    "prune far-from-every-cluster junk" curation filter (OCR noise,
    encoding garbage, off-distribution scrapes) that complements
    near-dup REMOVAL: near-dups are too close together, outliers are
    too far from everything.

    Scale shape: centroids broadcast (tiny), the per-vector nearest-
    centroid window partitions by the VECTOR id over n_centroids rows
    (bounded); the per-cluster percentile uses exact_ntile_by_group's
    BANDED default — approx-quantile band pre-cut + in-band ranks +
    broadcast prefix offsets — so a cluster holding 1/8 of a 10^12-row
    corpus never sorts in one task (the q47/q68/q92 kernel).  Output:
    (id, cluster_id, cos_c, band, is_outlier)."""
    from fineweb_domain_analyzer_spark.operators.quality import (
        exact_ntile_by_group,
    )

    centroids = (
        centroids_df
        if centroids_df is not None
        else deterministic_centroids(vectors, n_centroids, id_col, vec_col)
    )
    scored = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "_cc", F.round(cosine(F.col(vec_col), F.col("centroid_vec")), 6)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_cc").desc(), F.col("centroid_id")
    )
    assigned = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            F.col("centroid_id").alias("cluster_id"),
            F.col("_cc").alias("cos_c"),
        )
    )
    banded = exact_ntile_by_group(
        assigned,
        n_bands_ntile,
        order_col="cos_c",
        by_col="cluster_id",
        id_col=id_col,
        out_col="band",
    )
    return banded.select(
        id_col,
        "cluster_id",
        "cos_c",
        F.col("band").cast("bigint").alias("band"),
        (F.col("band") == 1).alias("is_outlier"),
    )
