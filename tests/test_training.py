"""Trainer tests: partitioning-determinism (the integer-exact gradient
contract), actual learning (distillation accuracy), serving plug-in
compatibility, and guard rails."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fineweb_domain_analyzer_spark.operators.quality import (
    gopher_keep,
    with_quality_features,
    with_quality_score,
)
from fineweb_domain_analyzer_spark.operators.training import (
    TrainedQualityModel,
    train_quality_classifier,
)


def _labeled_feats(spark, sf_dir):
    docs = spark.read.parquet(str(sf_dir / "documents.parquet"))
    feats = with_quality_features(docs)
    gate = gopher_keep(
        F.col("word_count"),
        F.col("mean_word_len"),
        F.col("symbol_ratio"),
        F.col("stopword_density"),
        F.col("max_word_repeat_ratio"),
    )
    return feats.withColumn("distill_label", F.coalesce(gate, F.lit(False)))


def test_partitioning_determinism(spark, sf_dir):
    """Integer quantization + decimal sums ⇒ bit-identical weights no
    matter how the input is partitioned (the local stand-in for
    N-vs-4N executor determinism)."""
    feats = _labeled_feats(spark, sf_dir)
    m3 = train_quality_classifier(
        feats.repartition(3), "distill_label", iters=4
    )
    m13 = train_quality_classifier(
        feats.repartition(13), "distill_label", iters=4
    )
    assert m3.weights == m13.weights  # exact float equality, not approx
    assert m3.mu == m13.mu and m3.sd == m13.sd and m3.n == m13.n


def test_distillation_learns_the_gate(spark, sf_dir):
    feats = _labeled_feats(spark, sf_dir).cache()
    model = train_quality_classifier(feats, "distill_label")
    assert isinstance(model, TrainedQualityModel)
    assert model.n == feats.count()
    scored = with_quality_score(feats, weights=model.weights, out_col="p")
    agg = scored.agg(
        F.avg(((F.col("p") >= 0.5) == F.col("distill_label")).cast("double")).alias("acc"),
        F.avg(F.col("distill_label").cast("double")).alias("base"),
        F.min("p").alias("lo"),
        F.max("p").alias("hi"),
    ).collect()[0]
    feats.unpersist()
    # must beat the majority-class baseline by a clear margin and
    # actually separate the classes
    majority = max(agg["base"], 1.0 - agg["base"])
    assert agg["acc"] > 0.9, agg
    assert agg["acc"] > majority + 0.2, agg
    assert 0.0 <= agg["lo"] <= agg["hi"] <= 1.0


def test_guard_rails(spark, sf_dir):
    feats = _labeled_feats(spark, sf_dir)
    with pytest.raises(ValueError, match="iters"):
        train_quality_classifier(feats, "distill_label", iters=0)
    with pytest.raises(ValueError, match="empty"):
        train_quality_classifier(
            feats.filter(F.lit(False)), "distill_label", iters=1
        )


def test_binary_metrics_hand_computed(spark):
    from fineweb_domain_analyzer_spark.operators.training import (
        binary_classification_metrics,
    )

    # scores: 0.9 (pos), 0.8 (neg), 0.6 tie (1 pos + 1 neg), 0.3 (neg),
    # 0.1 (pos), plus a null-score row that must be excluded.
    rows = [
        (0.9, True),
        (0.8, False),
        (0.6, True),
        (0.6, False),
        (0.3, False),
        (0.1, True),
        (None, True),
    ]
    df = spark.createDataFrame(rows, "score double, label boolean")
    m = binary_classification_metrics(df, "score", "label").collect()[0]
    # P=3, N=3. Pair wins for positives (vs each of 3 negs):
    # 0.9 beats all 3 -> 3; 0.6 beats {0.3}, ties {0.6} -> 1.5;
    # 0.1 beats none -> 0. AUC = 4.5 / 9 = 0.5
    assert m["n"] == 6 and m["n_pos"] == 3 and m["n_neg"] == 3
    assert m["auc"] == 4.5 / 9.0
    # threshold 0.5: predicted pos = {0.9,0.8,0.6,0.6} -> tp=2, fp=2;
    # predicted neg = {0.3,0.1} -> fn=1, tn=1
    assert (m["tp"], m["fp"], m["fn"], m["tn"]) == (2, 2, 1, 1)
    assert m["accuracy"] == 3.0 / 6.0
    assert m["precision"] == 2.0 / 4.0
    assert m["recall"] == 2.0 / 3.0
    assert m["f1"] == 4.0 / 7.0


def test_binary_metrics_degenerate(spark):
    from fineweb_domain_analyzer_spark.operators.training import (
        binary_classification_metrics,
    )

    # single-class input: AUC undefined (NULL), recall defined
    df = spark.createDataFrame(
        [(0.9, True), (0.2, True)], "score double, label boolean"
    )
    m = binary_classification_metrics(df, "score", "label").collect()[0]
    assert m["auc"] is None and m["recall"] == 0.5 and m["tn"] == 0
    # empty input: counts 0, ratios NULL
    e = binary_classification_metrics(
        df.filter("score > 1"), "score", "label"
    ).collect()[0]
    assert e["n"] == 0 and e["tp"] == 0
    assert e["auc"] is None and e["accuracy"] is None


def test_q81_heldout_eval(spark, sf_dir):
    from fineweb_domain_analyzer_spark.queries import q81_classifier_eval

    m = q81_classifier_eval(spark, str(sf_dir)).collect()[0]
    # the split must be a real partition of the corpus
    assert m["n"] > 0 and m["n"] < 500
    # distillation generalizes: held-out AUC well above chance
    assert m["auc"] is not None and m["auc"] > 0.8, dict(m.asDict())


def test_loss_trajectory_decreases(spark, sf_dir):
    feats = _labeled_feats(spark, sf_dir)
    m = train_quality_classifier(
        feats, "distill_label", iters=6, track_loss=True
    )
    assert len(m.loss_by_iter) == 6
    # full-batch GD on a convex loss with a sane lr: monotone descent
    assert all(
        b < a for a, b in zip(m.loss_by_iter, m.loss_by_iter[1:])
    ), m.loss_by_iter
    # trajectory is partitioning-independent like the weights
    m2 = train_quality_classifier(
        feats.repartition(7), "distill_label", iters=6, track_loss=True
    )
    assert m2.loss_by_iter == m.loss_by_iter


def test_pipeline_classifier_gate(spark, sf_dir):
    from fineweb_domain_analyzer_spark.plans.pipeline import (
        REASON_CLASSIFIER,
        PipelineConfig,
        quality_filter_pipeline,
    )
    from fineweb_domain_analyzer_spark.queries import pages_view, policy_view

    pages = pages_view(spark, str(sf_dir))
    policy = policy_view(spark, str(sf_dir))
    base = quality_filter_pipeline(
        pages, policy, PipelineConfig(scrub=False)
    ).select("doc_id", "keep", "drop_reason")
    feats = _labeled_feats(spark, sf_dir)
    model = train_quality_classifier(feats, "distill_label")
    gated = quality_filter_pipeline(
        pages,
        policy,
        PipelineConfig(scrub=False, quality_weights=model.weights),
    ).select("doc_id", "keep", "drop_reason", "quality_score")

    j = base.alias("b").join(gated.alias("g"), "doc_id").cache()
    # the classifier gate only ever RE-LABELS docs the base plan kept —
    # precedence robots > language > quality > classifier is preserved
    assert (
        j.filter(
            (F.col("b.drop_reason") != "kept")
            & (F.col("b.drop_reason") != F.col("g.drop_reason"))
        ).count()
        == 0
    )
    newly = j.filter(F.col("g.drop_reason") == REASON_CLASSIFIER)
    assert newly.count() > 0  # the gate actually fires on this corpus
    assert newly.filter(F.col("b.drop_reason") != "kept").count() == 0
    assert newly.filter(F.col("g.quality_score") >= 0.5).count() == 0
    # every doc the gated plan keeps scores at/above the threshold
    assert (
        j.filter(
            (F.col("g.drop_reason") == "kept")
            & (F.col("g.quality_score") < 0.5)
        ).count()
        == 0
    )
    j.unpersist()


def test_weights_save_load_roundtrip(spark, sf_dir, tmp_path):
    import json

    from fineweb_domain_analyzer_spark.operators.training import (
        load_weights,
        save_weights,
    )

    feats = _labeled_feats(spark, sf_dir)
    model = train_quality_classifier(feats, "distill_label", iters=2)
    p = str(tmp_path / "w.json")
    save_weights(model, p)
    loaded = load_weights(p)
    assert loaded == model.weights  # repr-precision JSON round-trips doubles
    # loud failures on malformed artifacts
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"format": "something-else", "weights": {}}))
    with pytest.raises(ValueError, match="not a fineweb-quality-logit"):
        load_weights(str(bad))
    doc = json.loads(open(p).read())
    del doc["weights"]["bias"]
    bad.write_text(json.dumps(doc))
    with pytest.raises(ValueError, match="weight keys"):
        load_weights(str(bad))


def test_cli_train_classifier(spark, sf_dir, tmp_path):
    import json

    from fineweb_domain_analyzer_spark.cli import main

    out = str(tmp_path / "weights.json")
    rc = main(
        [
            "--train-classifier",
            out,
            "--input",
            str(sf_dir / "documents.parquet"),
            "--master",
            "local[4]",
        ]
    )
    assert rc == 0
    from fineweb_domain_analyzer_spark.operators.training import load_weights

    w = load_weights(out)
    doc = json.loads(open(out).read())
    assert doc["meta"]["n"] == 500
    losses = doc["meta"]["loss_by_iter"]
    assert losses[-1] < losses[0]
    # the CLI-trained artifact serves through the pipeline gate
    from fineweb_domain_analyzer_spark.plans.pipeline import (
        PipelineConfig,
        quality_filter_pipeline,
    )
    from fineweb_domain_analyzer_spark.queries import pages_view, policy_view

    out_df = quality_filter_pipeline(
        pages_view(spark, str(sf_dir)),
        policy_view(spark, str(sf_dir)),
        PipelineConfig(scrub=False, quality_weights=w),
    )
    assert out_df.filter("drop_reason = 'classifier_filtered'").count() > 0


def test_q80_query_contract(spark, sf_dir):
    from fineweb_domain_analyzer_spark.queries import q80_trained_quality_score

    out = q80_trained_quality_score(spark, str(sf_dir))
    assert out.columns == [
        "doc_id",
        "distill_label",
        "trained_score",
        "trained_keep",
    ]
    bad = out.filter(
        (F.col("trained_keep") != (F.col("trained_score") >= 0.5))
        | F.col("trained_score").isNull()
    ).count()
    assert bad == 0


def test_calibration_hand_computed(spark):
    """Hand-checkable calibration: scores {0.1, 0.25, 0.8} with known
    labels — per-bin conf/acc/gap, ECE, MCE and Brier computed by hand.

    rows: (0.1, F) x3, (0.1, T) x1, (0.25, T) x1, (0.8, T) x2, (0.8, F) x2
    bins (10 equal-width): bin1 = {0.1}, bin2 = {0.25}, bin8 = {0.8}
      bin1: n=4 n_pos=1 conf=0.1  acc=0.25 gap=+0.15
      bin2: n=1 n_pos=1 conf=0.25 acc=1.0  gap=+0.75
      bin8: n=4 n_pos=2 conf=0.8  acc=0.5  gap=-0.30
    ECE  = (4*0.15 + 1*0.75 + 4*0.30)/9 = 2.55/9
    MCE  = 0.75
    Brier= (3*0.01 + 1*0.81 + 1*0.5625 + 2*0.04 + 2*0.64)/9 = 2.7625/9
    """
    from fineweb_domain_analyzer_spark.operators.training import (
        calibration_metrics,
        reliability_bins,
    )

    rows = (
        [(0.1, False)] * 3
        + [(0.1, True), (0.25, True)]
        + [(0.8, True)] * 2
        + [(0.8, False)] * 2
    )
    df = spark.createDataFrame(rows, "s double, y boolean")
    rb = {r["bin"]: r for r in reliability_bins(df, "s", "y").collect()}
    assert set(rb) == {1, 2, 8}
    assert (rb[1]["n"], rb[1]["n_pos"]) == (4, 1)
    assert rb[1]["conf"] == pytest.approx(0.1) and rb[1]["acc"] == 0.25
    assert rb[1]["gap"] == pytest.approx(0.15)
    assert (rb[2]["n"], rb[2]["n_pos"]) == (1, 1)
    assert rb[2]["gap"] == pytest.approx(0.75)
    assert (rb[8]["n"], rb[8]["n_pos"]) == (4, 2)
    assert rb[8]["gap"] == pytest.approx(-0.30)

    m = calibration_metrics(df, "s", "y").collect()[0]
    assert m["n"] == 9
    assert m["ece"] == pytest.approx(2.55 / 9)
    assert m["mce"] == pytest.approx(0.75)
    assert m["brier"] == pytest.approx(2.7625 / 9)


def test_calibration_edges(spark):
    """Edge semantics: score 1.0 lands in the top bin (capped), null
    scores are excluded, null labels count as negative, a perfectly
    calibrated constant predictor has ECE = MCE = 0, and groups split
    via by_cols."""
    from fineweb_domain_analyzer_spark.operators.training import (
        calibration_metrics,
        reliability_bins,
    )

    df = spark.createDataFrame(
        [("a", 1.0, True), ("a", 1.0, None), ("a", None, True)]
        + [("b", 0.5, True), ("b", 0.5, False)],
        "g string, s double, y boolean",
    )
    rb = {
        (r["g"], r["bin"]): r
        for r in reliability_bins(df, "s", "y", by_cols=["g"]).collect()
    }
    # null score excluded; 1.0 capped into bin 9; null label => negative
    assert set(rb) == {("a", 9), ("b", 5)}
    assert (rb[("a", 9)]["n"], rb[("a", 9)]["n_pos"]) == (2, 1)
    m = {
        r["g"]: r
        for r in calibration_metrics(df, "s", "y", by_cols=["g"]).collect()
    }
    # group b: conf == acc == 0.5 exactly -> zero calibration error,
    # Brier = 0.25
    assert m["b"]["ece"] == 0.0 and m["b"]["mce"] == 0.0
    assert m["b"]["brier"] == pytest.approx(0.25)
    assert m["a"]["n"] == 2


def test_threshold_sweep_hand_computed(spark):
    """Sweep over scores {0.2, 0.5, 0.9}: cumulative confusion counts
    and ratios at each distinct threshold, checked by hand.

    rows: (0.9,T)x2 (0.9,F)x1 (0.5,T)x1 (0.5,F)x2 (0.2,F)x3   P=3 N=6
      t=0.9: tp=2 fp=1 fn=1 tn=5  prec=2/3 rec=2/3 f1=2/3 acc=7/9
      t=0.5: tp=3 fp=3 fn=0 tn=3  prec=1/2 rec=1   f1=6/9=2/3 acc=6/9
      t=0.2: tp=3 fp=6 fn=0 tn=0  prec=1/3 rec=1   f1=1/2 acc=3/9
    best F1 ties at 2/3 between t=0.9 and t=0.5 -> tie-break picks the
    HIGHER threshold 0.9.
    """
    from fineweb_domain_analyzer_spark.operators.training import (
        best_operating_point,
        threshold_sweep,
    )

    rows = (
        [(0.9, True)] * 2
        + [(0.9, False), (0.5, True)]
        + [(0.5, False)] * 2
        + [(0.2, False)] * 3
    )
    df = spark.createDataFrame(rows, "s double, y boolean")
    sw = {r["t_si"]: r for r in threshold_sweep(df, "s", "y").collect()}
    assert set(sw) == {9000, 5000, 2000}
    r9 = sw[9000]
    assert (r9["tp"], r9["fp"], r9["fn"], r9["tn"]) == (2, 1, 1, 5)
    assert r9["precision"] == pytest.approx(2 / 3)
    assert r9["recall"] == pytest.approx(2 / 3)
    assert r9["f1"] == pytest.approx(2 / 3)
    assert r9["accuracy"] == pytest.approx(7 / 9)
    assert r9["threshold"] == pytest.approx(0.9)
    r5 = sw[5000]
    assert (r5["tp"], r5["fp"], r5["fn"], r5["tn"]) == (3, 3, 0, 3)
    assert r5["recall"] == 1.0 and r5["f1"] == pytest.approx(2 / 3)
    r2 = sw[2000]
    assert (r2["tp"], r2["fp"], r2["fn"], r2["tn"]) == (3, 6, 0, 0)
    assert r2["precision"] == pytest.approx(1 / 3)

    best = best_operating_point(df, "s", "y").collect()
    assert len(best) == 1 and best[0]["t_si"] == 9000  # tie -> stricter


def test_threshold_sweep_edges(spark):
    """Null score excluded, null label negative, all-negative group has
    NULL recall, by_cols split, and the argmax is per-group."""
    from fineweb_domain_analyzer_spark.operators.training import (
        best_operating_point,
        threshold_sweep,
    )

    df = spark.createDataFrame(
        [("a", 0.8, True), ("a", 0.3, None), ("a", None, True)]
        + [("b", 0.6, False), ("b", 0.1, False)],
        "g string, s double, y boolean",
    )
    sw = {
        (r["g"], r["t_si"]): r
        for r in threshold_sweep(df, "s", "y", by_cols=["g"]).collect()
    }
    # group a: rows (0.8,T) and (0.3,neg); null score dropped
    assert set(sw) == {("a", 8000), ("a", 3000), ("b", 6000), ("b", 1000)}
    assert (sw[("a", 8000)]["tp"], sw[("a", 8000)]["fp"]) == (1, 0)
    assert sw[("a", 8000)]["precision"] == 1.0
    assert (sw[("a", 3000)]["tp"], sw[("a", 3000)]["fp"]) == (1, 1)
    # group b has no positives -> recall NULL at every threshold
    assert sw[("b", 6000)]["recall"] is None
    assert sw[("b", 1000)]["recall"] is None
    best = {
        r["g"]: r
        for r in best_operating_point(df, "s", "y", by_cols=["g"]).collect()
    }
    assert best["a"]["t_si"] == 8000 and best["a"]["f1"] == 1.0
    assert set(best) == {"a", "b"}
