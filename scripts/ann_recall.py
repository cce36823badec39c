#!/usr/bin/env python
"""Recall@k of the approximate ANN paths (sign-LSH, IVF) against the
exact brute-force baseline, on the driver's embeddings table. Writes
BENCH/ann_recall.json — the accuracy half of the ANN speed/accuracy
trade-off that the scale paths buy."""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10
N_QUERIES = 50


def topk_sets(df):
    out: dict[int, set] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def recall(approx: dict[int, set], exact: dict[int, set]) -> float:
    num = sum(len(approx.get(q, set()) & nb) for q, nb in exact.items())
    den = sum(len(nb) for nb in exact.values())
    return round(num / den, 4) if den else 0.0


def main() -> None:
    from pyspark.sql import functions as F

    from fineweb_domain_analyzer_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_bucketed_topk,
    )
    from fineweb_domain_analyzer_spark.session import get_spark

    spark = get_spark(
        master="local[8]",
        extra_confs={"spark.ui.enabled": "false", "spark.ui.showConsoleProgress": "false"},
    )
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = topk_sets(brute_force_topk(queries, emb, k=K))
    result = {
        "sf_dir": SF,
        "corpus": n,
        "queries": N_QUERIES,
        "k": K,
        "recall": {
            "lsh_8planes": recall(topk_sets(lsh_bucketed_topk(queries, emb, k=K, n_planes=8)), exact),
            "lsh_8planes_multiprobe": recall(
                topk_sets(lsh_bucketed_topk(queries, emb, k=K, n_planes=8, multi_probe=True)),
                exact,
            ),
            "lsh_4planes": recall(topk_sets(lsh_bucketed_topk(queries, emb, k=K, n_planes=4)), exact),
            "lsh_4planes_multiprobe": recall(
                topk_sets(lsh_bucketed_topk(queries, emb, k=K, n_planes=4, multi_probe=True)),
                exact,
            ),
            "ivf_8cent": recall(topk_sets(ivf_topk(queries, emb, k=K, n_centroids=8)), exact),
            "ivf_4cent": recall(topk_sets(ivf_topk(queries, emb, k=K, n_centroids=4)), exact),
        },
        "candidate_fraction": {
            "lsh_8planes": round(1 / 2**8, 4),
            "lsh_8planes_multiprobe": round(9 / 2**8, 4),
            "lsh_4planes": round(1 / 2**4, 4),
            "lsh_4planes_multiprobe": round(5 / 2**4, 4),
            "ivf_8cent": round(1 / 8, 4),
            "ivf_4cent": round(1 / 4, 4),
        },
        "note": (
            "candidate_fraction is the expected recall of a RANDOM bucket "
            "of the same size; recall above it is real signal. The "
            "driver's synthetic embeddings are near-orthogonal (no true "
            "cluster structure), which lower-bounds achievable recall — "
            "on real embedding corpora locality is far stronger."
        ),
    }

    # --- planted-cluster corpus: what recall looks like when locality is
    # real (the regime ANN is actually used in) ------------------------------
    import numpy as np

    from fineweb_domain_analyzer_spark.operators.similarity import random_planes

    rng = np.random.RandomState(7)
    n_clusters, per_cluster, dim, noise = 40, 25, 64, 0.25
    centers = rng.standard_normal((n_clusters, dim))
    pts = np.repeat(centers, per_cluster, axis=0) + noise * rng.standard_normal(
        (n_clusters * per_cluster, dim)
    )
    planted = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "vec_id bigint, embedding array<double>",
    ).cache()
    pq = planted.filter(F.col("vec_id") % per_cluster == 0).filter(
        F.col("vec_id") < 25 * per_cluster
    )
    p_exact = topk_sets(brute_force_topk(pq, planted, k=K))
    gplanes = random_planes(8, dim, seed=42)
    result["planted"] = {
        "corpus": n_clusters * per_cluster,
        "clusters": n_clusters,
        "noise_sigma": noise,
        "queries": 25,
        "k": K,
        "recall": {
            "lsh_axis8": recall(
                topk_sets(lsh_bucketed_topk(pq, planted, k=K, n_planes=8)), p_exact
            ),
            "lsh_axis8_multiprobe": recall(
                topk_sets(
                    lsh_bucketed_topk(pq, planted, k=K, n_planes=8, multi_probe=True)
                ),
                p_exact,
            ),
            "lsh_gauss8": recall(
                topk_sets(lsh_bucketed_topk(pq, planted, k=K, planes=gplanes)),
                p_exact,
            ),
            "lsh_gauss8_multiprobe": recall(
                topk_sets(
                    lsh_bucketed_topk(
                        pq, planted, k=K, planes=gplanes, multi_probe=True
                    )
                ),
                p_exact,
            ),
            "ivf_8cent": recall(
                topk_sets(ivf_topk(pq, planted, k=K, n_centroids=8)), p_exact
            ),
        },
    }
    from fineweb_domain_analyzer_spark.operators.similarity import kmeans_centroids

    kc = kmeans_centroids(planted, n_centroids=8).cache()
    kc.count()
    result["planted"]["recall"].update(
        {
            "ivf_kmeans8_nprobe1": recall(
                topk_sets(ivf_topk(pq, planted, k=K, centroids_df=kc)), p_exact
            ),
            "ivf_kmeans8_nprobe2": recall(
                topk_sets(
                    ivf_topk(pq, planted, k=K, centroids_df=kc, nprobe=2)
                ),
                p_exact,
            ),
        }
    )
    result["planted"].update({
        "candidate_fraction": {
            "lsh_*8": round(1 / 2**8, 4),
            "lsh_*8_multiprobe": round(9 / 2**8, 4),
            "ivf_8cent": round(1 / 8, 4),
            "ivf_kmeans8_nprobe1": round(1 / 8, 4),
            "ivf_kmeans8_nprobe2": round(2 / 8, 4),
        },
        "note": (
            "seeded gaussian hyperplanes (random_planes) vs the "
            "oracle-portable axis family, plus real k-means IVF "
            "centroids with nprobe 1/2, on a corpus with genuine "
            "cluster structure — the production operating point."
        ),
    })
    # --- near-dup recall: sizing rule + banded OR-construction ---------------
    from fineweb_domain_analyzer_spark.operators.similarity import (
        embedding_near_dups,
        sized_n_planes,
    )

    jit = pts + 0.1 * rng.standard_normal(pts.shape)
    nd_rows = [(i, [float(x) for x in row]) for i, row in enumerate(pts)]
    nd_rows += [(i + 100_000, [float(x) for x in row]) for i, row in enumerate(jit)]
    nd = spark.createDataFrame(
        nd_rows, "vec_id bigint, embedding array<double>"
    ).cache()
    nd_n = nd.count()
    planted_pairs = len(pts)

    def nd_recall(**kw):
        found = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dups(nd, threshold=0.9, **kw).collect()
        }
        hits = sum(1 for i in range(planted_pairs) if (i, i + 100_000) in found)
        return round(hits / planted_pairs, 4)

    auto_planes = sized_n_planes(nd_n, target_bucket_size=128)
    result["near_dup"] = {
        "corpus": nd_n,
        "planted_pairs": planted_pairs,
        "threshold": 0.9,
        "auto_n_planes_at_this_corpus": auto_planes,
        "recall": {
            "single_band_8planes": nd_recall(n_planes=8, bands=1),
            "single_band_auto_sized": nd_recall(corpus_size=nd_n),
            "banded_2x4": nd_recall(n_planes=4, bands=2),
            "banded_4x4_gauss": nd_recall(
                n_planes=4, bands=4, planes=random_planes(16, 64, seed=5)
            ),
        },
        "note": (
            "sized_n_planes keeps the expected bucket ~target as the "
            "corpus grows (the fixed 8-plane default was 256 buckets "
            "forever); banded OR-construction (any-band match, like "
            "MinHash-LSH) restores recall as bits-per-corpus rise. All "
            "variants exact-cosine verify, so precision is 1.0 by "
            "construction."
        ),
    }
    out = REPO / "BENCH" / "ann_recall.json"
    out.write_text(json.dumps(result, indent=2) + "\n", encoding="utf-8")
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
