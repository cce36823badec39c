"""Distributed quality-classifier TRAINING (FineWeb-Edu-style distillation).

The serving side (``operators/quality.py:with_quality_score``) scores
documents with a logistic model over the heuristic quality features;
until now the weights were fixed constants ("swap for a trained
model's").  This module closes the loop: full-batch logistic-regression
training ON the cluster, distilling a teacher signal (by default the
Gopher heuristic gate — the same move FineWeb-Edu makes with LLM
annotations) into weights that plug straight back into
``with_quality_score`` without touching the serving plan.

Reference anchor: the reference engine (fineweb_analyzer.py) has no
trained classifier at all — its quality stage is the fixed heuristic
gate.  This is an extension in the SURVEY §2 "LLM-data-pipeline
operators" tier, like the dedup/ANN families.

Determinism contract (what makes this oracle-checkable)
-------------------------------------------------------
Floating-point summation is not associative, so a naive ``sum(grad)``
depends on partitioning and would differ between local[8]/local[32]
runs and between Spark and DuckDB.  Instead every per-row contribution
is quantized to an integer — ``round(value * QUANTUM)`` — and summed as
``decimal(38,0)`` (Spark) / ``HUGEINT`` (DuckDB): integer addition IS
associative, so the aggregated sums are bit-identical under any
partitioning or plan, and the driver-side weight updates (plain IEEE
double arithmetic on those exact sums, written with the same
association order as the SQL oracle) reproduce bit-for-bit on both
engines.  ``sqrt`` is IEEE-exact-rounded, so the standardization
moments fold in deterministically too.  The only residual cross-engine
risk is a 1-ulp ``exp``/``ln`` libm difference landing a quantized
gradient exactly on a rounding boundary — probability ~1e-10 per
row-feature, the same accepted risk class as the existing rounded
score oracles (q13/q57).

Scale design (the 100-TB story)
-------------------------------
* The projected training frame is 6 doubles + 1 label per document —
  a few hundred GB at 10^12 docs — persisted once
  (MEMORY_AND_DISK) and scanned ``iters + 1`` times.
* Each pass is ONE aggregation to a single row: Spark computes
  map-side partial sums per partition (decimal adds), then a single
  final reduce over #partitions partial rows — no wide shuffle, no
  driver-side per-row traffic.  The driver holds six doubles.
* Gradient magnitudes are bounded by ``|err| * |z| * QUANTUM`` ≈ 1e7
  per row, so a ``long`` would overflow around 1e12 rows — exactly the
  target scale — hence decimal(38,0)/HUGEINT accumulators (exact to
  1e38).
* Feature standardization (computed in the same one-pass moment
  aggregation) is what makes plain full-batch GD converge in ~16
  steps despite wildly different feature scales; the learned
  standardized weights are folded back into raw-feature space at the
  end, so serving needs no mu/sd columns.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

# Shared with the SQL-oracle generator (queries._q80_sql) — change them
# together or parity breaks.
TRAIN_ITERS = 16
TRAIN_LR = 2.0
TRAIN_QUANTUM = 1_000_000

# Feature basis, in with_quality_score's exact weight order; the
# expressions must stay textually parallel to the oracle's
# (f1=ln(1+word_count), f2..f5 = the 4dp-rounded ratio features).
FEATURE_KEYS = [
    "word_count_log",
    "mean_word_len",
    "symbol_ratio",
    "stopword_density",
    "max_word_repeat_ratio",
]


def _feature_cols() -> list[Column]:
    return [
        F.log1p(F.col("word_count")),
        F.col("mean_word_len"),
        F.col("symbol_ratio"),
        F.col("stopword_density"),
        F.col("max_word_repeat_ratio"),
    ]


@dataclass(frozen=True)
class TrainedQualityModel:
    """Result of ``train_quality_classifier``.

    ``weights`` is folded into RAW feature space and keyed exactly like
    ``quality.QUALITY_LOGIT_WEIGHTS`` — pass it straight to
    ``with_quality_score(df, weights=model.weights)``.
    """

    weights: dict[str, float]
    std_weights: list[float] = field(repr=False)  # [bias, w1..w5] standardized
    mu: list[float] = field(repr=False)
    sd: list[float] = field(repr=False)
    n: int = 0
    iters: int = TRAIN_ITERS
    lr: float = TRAIN_LR
    quantum: int = TRAIN_QUANTUM
    # mean logloss at the START of each iteration (before that step's
    # update), present when track_loss=True; quantized-integer-summed,
    # so the trajectory is partitioning-independent like the weights
    loss_by_iter: tuple[float, ...] = ()


def _qsum(col: Column, quantum: float) -> Column:
    """Integer-exact accumulator: round(col * quantum) summed as
    decimal(38,0).  Associative ⇒ partitioning-independent."""
    return F.sum(F.round(col * F.lit(quantum), 0).cast("decimal(38,0)"))


def train_quality_classifier(
    feats: DataFrame,
    label_col: str,
    iters: int = TRAIN_ITERS,
    lr: float = TRAIN_LR,
    quantum: int = TRAIN_QUANTUM,
    track_loss: bool = False,
) -> TrainedQualityModel:
    """Full-batch logistic GD over the ``with_quality_features``
    columns, distilling the boolean ``label_col`` (teacher signal).

    ``feats`` must carry word_count / mean_word_len / symbol_ratio /
    stopword_density / max_word_repeat_ratio (from
    ``with_quality_features``) plus the boolean/numeric label.

    Runs ``iters + 1`` single-row aggregations over a persisted
    6-doubles-per-row projection (see module docstring for the scale
    and determinism analysis).  Returns folded raw-space weights
    compatible with ``with_quality_score``.

    ``track_loss=True`` piggybacks a quantized mean-logloss column on
    each gradient pass (no extra job): ``loss_by_iter[t]`` is the loss
    at the weights iteration ``t`` started from — a deterministic
    convergence trace for monitoring/early-stopping.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    qf = float(quantum)
    y = F.when(F.col(label_col).cast("boolean"), F.lit(1.0)).otherwise(F.lit(0.0))
    k = len(FEATURE_KEYS)
    proj = feats.select(
        y.alias("_y"),
        *[c.alias(f"_f{j}") for j, c in enumerate(_feature_cols(), start=1)],
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # one pass: n + first/second moments of every feature
        aggs = [F.count(F.lit(1)).alias("n")]
        for j in range(1, k + 1):
            fj = F.col(f"_f{j}")
            aggs.append(_qsum(fj, qf).alias(f"s1{j}"))
            aggs.append(_qsum(fj * fj, qf).alias(f"s2{j}"))
        row = proj.agg(*aggs).collect()[0]
        n = int(row["n"])
        if n == 0:
            raise ValueError("train_quality_classifier: empty input")
        mu: list[float] = []
        sd: list[float] = []
        for j in range(1, k + 1):
            m = float(row[f"s1{j}"]) / qf / n
            var = float(row[f"s2{j}"]) / qf / n - m * m
            s = math.sqrt(max(var, 0.0))
            mu.append(m)
            sd.append(1.0 if s < 1e-12 else s)

        zcols = [
            (F.col(f"_f{j}") - F.lit(mu[j - 1])) / F.lit(sd[j - 1])
            for j in range(1, k + 1)
        ]
        w = [0.0] * (k + 1)  # [bias, w1..w5] in standardized space
        losses: list[float] = []
        for _ in range(iters):
            z = F.lit(w[0])
            for j in range(1, k + 1):
                z = z + F.lit(w[j]) * zcols[j - 1]
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            err = p - F.col("_y")
            gaggs = [_qsum(err, qf).alias("g0")]
            for j in range(1, k + 1):
                gaggs.append(_qsum(err * zcols[j - 1], qf).alias(f"g{j}"))
            if track_loss:
                # eps-clamped so a saturated sigmoid (p = 0.0 or 1.0 in
                # double) can't send ln to -inf
                loss = -(
                    F.col("_y") * F.log(F.greatest(p, F.lit(1e-12)))
                    + (F.lit(1.0) - F.col("_y"))
                    * F.log(F.greatest(F.lit(1.0) - p, F.lit(1e-12)))
                )
                gaggs.append(_qsum(loss, qf).alias("loss"))
            grow = proj.agg(*gaggs).collect()[0]
            if track_loss:
                losses.append(float(grow["loss"]) / qf / n)
            for j in range(k + 1):
                w[j] = w[j] - lr * (float(grow[f"g{j}"]) / qf / n)
    finally:
        proj.unpersist()

    # fold standardization into raw-feature space:
    #   score = sigmoid(b + Σ wj * (fj - mu)/sd)
    #         = sigmoid((b - Σ wj*mu/sd) + Σ (wj/sd) * fj)
    bias = w[0]
    for j in range(1, k + 1):
        bias = bias - w[j] * mu[j - 1] / sd[j - 1]
    folded = {"bias": bias}
    for j, key in enumerate(FEATURE_KEYS, start=1):
        folded[key] = w[j] / sd[j - 1]
    return TrainedQualityModel(
        weights=folded,
        std_weights=w,
        mu=mu,
        sd=sd,
        n=n,
        iters=iters,
        lr=lr,
        quantum=quantum,
        loss_by_iter=tuple(losses),
    )


WEIGHTS_FORMAT = "fineweb-quality-logit-v1"


def save_weights(model: TrainedQualityModel, path: str) -> None:
    """Persist trained weights as a small JSON artifact (repr-precision
    floats round-trip doubles exactly), ready for
    ``PipelineConfig(quality_weights=load_weights(path))`` or the CLI's
    ``--classifier-weights``.  Driver-side O(1) — the model is six
    floats; corpus-scale state never leaves the executors."""
    import json

    doc = {
        "format": WEIGHTS_FORMAT,
        "weights": model.weights,
        "meta": {
            "n": model.n,
            "iters": model.iters,
            "lr": model.lr,
            "quantum": model.quantum,
            "mu": list(model.mu),
            "sd": list(model.sd),
            "std_weights": list(model.std_weights),
            "loss_by_iter": list(model.loss_by_iter),
        },
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")


def load_weights(path: str) -> dict[str, float]:
    """Load and validate a ``save_weights`` artifact; returns the
    with_quality_score-compatible weights dict.  Loud failure on a
    wrong format marker or missing/extra weight keys — never silently
    serves a malformed model."""
    import json

    with open(path) as f:
        doc = json.load(f)
    if not isinstance(doc, dict) or doc.get("format") != WEIGHTS_FORMAT:
        raise ValueError(
            f"{path}: not a {WEIGHTS_FORMAT} artifact "
            f"(format={doc.get('format') if isinstance(doc, dict) else type(doc).__name__!r})"
        )
    weights = doc.get("weights")
    expected = {"bias", *FEATURE_KEYS}
    if not isinstance(weights, dict) or set(weights) != expected:
        got = sorted(weights) if isinstance(weights, dict) else weights
        raise ValueError(
            f"{path}: weight keys {got} != expected {sorted(expected)}"
        )
    return {k: float(v) for k, v in weights.items()}


def binary_classification_metrics(
    df: DataFrame,
    score_col: str,
    label_col: str,
    threshold: float = 0.5,
    by_cols: list[str] | None = None,
) -> DataFrame:
    """Exact, deterministic evaluation of a [0,1] score against a
    boolean label: AUC (ties count ½), confusion counts at
    ``threshold``, accuracy / precision / recall / F1 — one row
    globally, or one row per group when ``by_cols`` is given
    (per-language eval, per-source eval, …).  Rows with a null score
    are excluded; a null group key forms its own group.

    Scale design: scores from ``with_quality_score`` are rounded to
    4 dp, so the score domain is BOUNDED (≤ 10 001 distinct values per
    group).  The plan is therefore: ONE groupBy(group, score) shuffle
    collapsing the corpus to per-score (pos, neg) counts, then an
    ordered window over that bounded bin frame (each window partition
    ≤ 10 001 rows by the score resolution, NOT by corpus size — safe
    at any scale; the global case is a single bounded partition), then
    a per-group aggregate.  The AUC numerator
    Σ pos_b·(2·cum_neg_below + neg_b) reaches ~2·P·N ≈ 2e24 at the
    1e12-doc target, so it accumulates as decimal(38,0) (bigint would
    overflow); every metric is a single division of exact integers ⇒
    bit-identical across engines and partitionings, and
    SQL-oracle-checkable.  Degenerate denominators (no positives, no
    predicted positives, …) yield NULL rather than NaN on both
    engines.
    """
    by = list(by_cols or [])
    s = df.filter(F.col(score_col).isNotNull()).select(
        *by,
        F.col(score_col).alias("_s"),
        F.when(F.col(label_col).cast("boolean"), F.lit(1)).otherwise(F.lit(0)).alias("_y"),
    )
    bins = s.groupBy(*by, "_s").agg(
        F.sum("_y").alias("pos"),
        F.sum(F.lit(1) - F.col("_y")).alias("neg"),
    )
    # bounded ≤10001-row window partitions: deliberate and safe (see
    # docstring); with no by_cols this is one bounded partition
    w = (
        Window.partitionBy(*by)
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binc = bins.withColumn(
        "cumneg", F.coalesce(F.sum("neg").over(w), F.lit(0).cast("bigint"))
    )
    thr = F.lit(float(threshold))

    def csum(col: Column) -> Column:
        return F.coalesce(F.sum(col), F.lit(0).cast("bigint"))

    agg = binc.groupBy(*by).agg(
        F.sum(
            F.col("pos").cast("decimal(38,0)")
            * (F.lit(2) * F.col("cumneg") + F.col("neg"))
        ).alias("num"),
        csum(F.col("pos")).alias("n_pos"),
        csum(F.col("neg")).alias("n_neg"),
        csum(F.when(F.col("_s") >= thr, F.col("pos")).otherwise(F.lit(0))).alias("tp"),
        csum(F.when(F.col("_s") >= thr, F.col("neg")).otherwise(F.lit(0))).alias("fp"),
        csum(F.when(F.col("_s") < thr, F.col("pos")).otherwise(F.lit(0))).alias("fn"),
        csum(F.when(F.col("_s") < thr, F.col("neg")).otherwise(F.lit(0))).alias("tn"),
    )

    def ratio(num: Column, den: Column) -> Column:
        return F.when(
            den > 0, num.cast("double") / den.cast("double")
        ).otherwise(F.lit(None).cast("double"))

    n = F.col("n_pos") + F.col("n_neg")
    return agg.select(
        *by,
        n.alias("n"),
        "n_pos",
        "n_neg",
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.col("num").cast("double")
            / (F.lit(2.0) * F.col("n_pos").cast("double") * F.col("n_neg").cast("double")),
        ).otherwise(F.lit(None).cast("double")).alias("auc"),
        ratio(F.col("tp") + F.col("tn"), n).alias("accuracy"),
        ratio(F.col("tp"), F.col("tp") + F.col("fp")).alias("precision"),
        ratio(F.col("tp"), F.col("tp") + F.col("fn")).alias("recall"),
        ratio(
            F.lit(2) * F.col("tp"),
            F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn"),
        ).alias("f1"),
    )


def _score_int_bins(
    df: DataFrame, score_col: str, label_col: str, by: list[str]
) -> DataFrame:
    """The ONE corpus-wide shuffle shared by the calibration metrics:
    collapse (group…, 4dp score) to (pos, neg) counts, with the score
    carried as the exact integer ``_si = round(score * 10000)`` so every
    downstream statistic is integer arithmetic.  Output is bounded at
    ≤ 10 001 rows per group regardless of corpus size."""
    s = df.filter(F.col(score_col).isNotNull()).select(
        *by,
        F.round(F.col(score_col) * 10000, 0).cast("bigint").alias("_si"),
        F.when(F.col(label_col).cast("boolean"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("_y"),
    )
    return s.groupBy(*by, "_si").agg(
        F.sum("_y").alias("pos"),
        F.sum(F.lit(1) - F.col("_y")).alias("neg"),
    )


def _calib_bin(n_bins: int) -> Column:
    # pure integer bin assignment (si * n_bins div 10000, capped) —
    # floor(score * n_bins) expressed without float edge ambiguity, so
    # Spark and the SQL oracle can never disagree at a bin boundary
    return F.least(
        F.expr(f"_si * {int(n_bins)} div 10000"), F.lit(int(n_bins) - 1)
    ).alias("bin")


def reliability_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    by_cols: list[str] | None = None,
) -> DataFrame:
    """Reliability table for a [0,1] score vs a boolean label: per
    equal-width score bin, the doc count, positive count, mean
    predicted score (``conf``), empirical positive rate (``acc``) and
    the calibration gap ``acc - conf``.  This is the table behind a
    reliability diagram — the operating evidence for choosing the
    serving threshold of the q80 trained classifier.

    Determinism/scale: scores are 4dp, so after the one
    groupBy(group, score) corpus shuffle everything is exact integer
    math over ≤ 10 001 rows per group.  ``conf`` needs Σ(count·si),
    which reaches 10⁴·10¹² = 10¹⁶ per score row and ~10¹⁷ per bin at
    the 10¹²-doc target — summed as decimal(38,0) for headroom (the
    same bigint-overflow argument as the AUC numerator).  The doubles
    in the output are single divisions of exact integers, written with
    the same association order as the SQL oracle ⇒ bit-identical."""
    by = list(by_cols or [])
    sb = _score_int_bins(df, score_col, label_col, by)
    binned = sb.groupBy(*by, _calib_bin(n_bins)).agg(
        F.sum(F.col("pos") + F.col("neg")).alias("n"),
        F.sum("pos").alias("n_pos"),
        F.sum(
            ((F.col("pos") + F.col("neg")) * F.col("_si")).cast("decimal(38,0)")
        ).alias("_ssum"),
    )
    conf = F.col("_ssum").cast("double") / (
        F.lit(10000.0) * F.col("n").cast("double")
    )
    acc = F.col("n_pos").cast("double") / F.col("n").cast("double")
    return binned.select(
        *by,
        "bin",
        "n",
        "n_pos",
        conf.alias("conf"),
        acc.alias("acc"),
        (acc - conf).alias("gap"),
    )


def calibration_metrics(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    by_cols: list[str] | None = None,
) -> DataFrame:
    """Scalar calibration summary of a [0,1] score vs a boolean label:
    expected calibration error (ECE, bin-weighted |acc − conf|),
    maximum calibration error (MCE) over the same ``n_bins`` equal-width
    bins, and the Brier score — one row globally or per ``by_cols``
    group.

    Exactness: with 4dp scores every numerator is an integer —
    ECE = Σ_b |10⁴·n_pos_b − Σsi_b| / (10⁴·N), and the Brier numerator
    Σ pos·(si−10⁴)² + neg·si² is exact per SCORE bin (so it reuses the
    same single corpus shuffle, not a second pass).  Per-row Brier
    contributions reach 10⁸, i.e. ~10²⁰ summed at the 10¹²-doc target —
    decimal(38,0) accumulators, doubles only in the final division.
    MCE is a max of per-bin exact ratios (order-independent).  All
    three mirror bit-for-bit in the DuckDB oracle (queries._q84_sql)."""
    by = list(by_cols or [])
    sb = _score_int_bins(df, score_col, label_col, by)
    dec = "decimal(38,0)"
    binned = sb.groupBy(*by, _calib_bin(n_bins)).agg(
        F.sum(F.col("pos") + F.col("neg")).alias("n"),
        F.sum("pos").alias("n_pos"),
        F.sum(
            ((F.col("pos") + F.col("neg")) * F.col("_si")).cast(dec)
        ).alias("_ssum"),
        F.sum(
            F.col("pos").cast(dec)
            * ((F.col("_si") - 10000) * (F.col("_si") - 10000))
            + F.col("neg").cast(dec) * (F.col("_si") * F.col("_si"))
        ).alias("_bnum"),
    )
    gap_num = F.abs(
        F.col("n_pos").cast(dec) * F.lit(10000) - F.col("_ssum")
    )
    per_bin = binned.select(
        *by,
        "n",
        gap_num.alias("_gnum"),
        (
            gap_num.cast("double")
            / (F.lit(10000.0) * F.col("n").cast("double"))
        ).alias("_bin_gap"),
        "_bnum",
    )
    agg = per_bin.groupBy(*by).agg(
        F.sum("n").alias("n"),
        F.sum("_gnum").alias("_gsum"),
        F.max("_bin_gap").alias("mce"),
        F.sum("_bnum").alias("_bsum"),
    )
    nd = F.col("n").cast("double")
    return agg.select(
        *by,
        "n",
        (F.col("_gsum").cast("double") / (F.lit(10000.0) * nd)).alias("ece"),
        "mce",
        (F.col("_bsum").cast("double") / (F.lit(100000000.0) * nd)).alias(
            "brier"
        ),
    )


def threshold_sweep(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by_cols: list[str] | None = None,
) -> DataFrame:
    """PR/ROC sweep of a [0,1] score vs a boolean label: one row per
    DISTINCT 4dp score value ``t``, with the confusion counts and
    precision/recall/F1/accuracy of the rule ``keep iff score >= t``.
    This is the full operating-characteristic table behind choosing the
    serving threshold (``PipelineConfig.min_quality_score``) for the
    q80 trained classifier.

    Scale/determinism: reuses the ONE groupBy(group, 4dp score) corpus
    shuffle (`_score_int_bins`), after which the cumulative confusion
    counts are a window over ≤ 10 001 rows per group — bounded by the
    score RESOLUTION, never by corpus size (same argument as the q81
    AUC window).  Counts stay exact bigints (tp ≤ 10¹² ≪ 2⁶³); the
    ratio columns are single divisions of those exact integers written
    with the same association order as the SQL oracle ⇒ bit-identical.
    ``t_si = round(t·10⁴)`` is emitted as the integer join/sort key so
    no float ever has to round-trip through a string.

    Null scores are excluded; null labels count as negative (matching
    `binary_classification_metrics`).  ``recall`` is null when the
    group has no positives (0/0), mirrored as NULL in SQL.
    """
    by = list(by_cols or [])
    sb = _score_int_bins(df, score_col, label_col, by)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_si").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*by)
    cum = sb.select(
        *by,
        F.col("_si").alias("t_si"),
        F.sum("pos").over(w).alias("tp"),
        F.sum("neg").over(w).alias("fp"),
        F.sum("pos").over(wall).alias("_p"),
        F.sum("neg").over(wall).alias("_n"),
    )
    tp, fp = F.col("tp"), F.col("fp")
    fn = (F.col("_p") - tp).alias("fn")
    tn = (F.col("_n") - fp).alias("tn")
    d = lambda c: c.cast("double")  # noqa: E731
    return cum.select(
        *by,
        "t_si",
        (d(F.col("t_si")) / F.lit(10000.0)).alias("threshold"),
        "tp",
        "fp",
        fn,
        tn,
        (d(tp) / d(tp + fp)).alias("precision"),
        F.when(F.col("_p") > 0, d(tp) / d(F.col("_p"))).alias("recall"),
        (
            F.lit(2.0) * d(tp) / d(F.lit(2) * tp + fp + F.col("_p") - tp)
        ).alias("f1"),
        ((d(tp) + d(F.col("_n") - fp)) / d(F.col("_p") + F.col("_n"))).alias(
            "accuracy"
        ),
    )


def best_operating_point(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by_cols: list[str] | None = None,
) -> DataFrame:
    """The argmax-F1 row of `threshold_sweep` — the recommended serving
    threshold per group.  Deterministic tie-break: among equal-F1
    thresholds take the HIGHEST (strictest gate that achieves the best
    F1 — fewer kept docs for the same quality trade-off).

    The ranking window runs over the sweep's ≤ 10 001 bounded rows per
    group, so the top-1 pick is as scale-safe as the sweep itself.
    F1 values being compared are bit-identical deterministic doubles
    (exact-integer divisions), so the tie-break is reproducible across
    partitionings and engines.
    """
    by = list(by_cols or [])
    sweep = threshold_sweep(df, score_col, label_col, by)
    rank = Window.partitionBy(*by).orderBy(
        F.col("f1").desc(), F.col("t_si").desc()
    )
    return (
        sweep.withColumn("_rn", F.row_number().over(rank))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
