"""Mixture planning — target-share rebalancing with up/down-sampling.

Training-data recipes (Llama/Dolma/Pile style) specify the corpus as
target SHARES per group (language, source, domain tier) plus a total
document budget; the pipeline must then derive per-group sampling
rates, downsample over-represented groups, and UPSAMPLE (repeat for
multiple epochs) under-represented ones — deterministically, so the
same recipe always yields the same corpus.  The existing
``operators/filtering.py:stratified_hash_sample`` applies manual
percent rates; this module derives the rates from the recipe and adds
the epochs/remainder upsampling path.

Reference anchor: none — the reference engine has no sampling at all;
this is an extension in the SURVEY §2 "LLM-data-pipeline operators"
tier (curation family, alongside q49/q59/q68).

Determinism contract
--------------------
Everything is exact integer arithmetic: target shares are basis points
(bigint), rates are integer 1e-4 units via integer division
(``target_bp · budget div n_g`` — ≤ 1e16 at the 1e12-doc target, well
inside bigint), and per-document membership is the md5-bucket recipe
(first 6 hex chars mod 10⁴), so copies never depend on partitioning,
engine, or unrelated rows.  No floats anywhere ⇒ the oracle is
hash-exact with no rounding-boundary risk class at all.

Scale design (the 100-TB story)
-------------------------------
* ``mixture_plan`` is ONE group-keyed count shuffle; the plan frame is
  O(|groups|) rows and the per-group totals come from a bounded window
  over those rows (never a second corpus scan).
* ``assign_copies`` broadcast-joins the tiny plan onto the corpus —
  map-side only, whole-stage codegen.
* ``materialize`` explodes ``sequence(1, copies)`` — output size is the
  budget, input is scanned once; a doc with copies = 0 is filtered
  before the explode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["mixture_plan", "assign_copies", "materialize", "mixture_summary"]


def _grp(group_col: str) -> Column:
    return F.coalesce(F.col(group_col).cast("string"), F.lit("∅"))


def _bucket_e4(id_col: str) -> Column:
    """md5-bucket in 0..9999 — the 1e-4-resolution sibling of the q49
    percent bucket, same stability guarantees (membership is a pure
    function of the id)."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        % 10000
    )


def mixture_plan(
    df: DataFrame,
    group_col: str,
    budget: int | None = None,
    target_shares_bp: dict[str, int] | None = None,
) -> DataFrame:
    """Per-group sampling plan for a target mixture: one row per group
    with ``n_available``, ``target_bp`` (basis points of the budget),
    ``rate_e4`` (sampling rate in 1e-4 units, may exceed 10 000 =
    upsampling), ``epochs`` (full passes) and ``rem_e4`` (fractional
    remainder applied as a deterministic hash Bernoulli).

    ``budget`` defaults to the corpus size (pure rebalancing);
    ``target_shares_bp`` defaults to balanced — ``10000 div n_groups``
    per observed group (groups beyond the named ones in an explicit
    dict get share 0 and are dropped by the sampler).

    rate_e4 = target_bp · budget div n_available — exact integer
    division, floor semantics: the plan under-fills rather than
    over-fills the budget (by < 1 doc per group per 1e-4)."""
    g = _grp(group_col)
    counts = df.select(g.alias("grp")).groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_available")
    )
    wall = Window.partitionBy()
    counts = counts.withColumn(
        "_total", F.sum("n_available").over(wall)
    ).withColumn("_n_groups", F.count(F.lit(1)).over(wall))
    b = F.lit(int(budget)) if budget is not None else F.col("_total")
    if target_shares_bp is None:
        tbp: Column = F.expr("10000 div _n_groups")
    else:
        tbp = F.lit(0)
        for grp_val, bp in sorted(target_shares_bp.items()):
            tbp = F.when(F.col("grp") == grp_val, F.lit(int(bp))).otherwise(
                tbp
            )
    plan = counts.select(
        "grp",
        "n_available",
        tbp.cast("bigint").alias("target_bp"),
        b.cast("bigint").alias("_budget"),
    ).withColumn(
        "rate_e4",
        F.expr("(target_bp * _budget) div n_available").cast("bigint"),
    )
    return plan.select(
        "grp",
        "n_available",
        "target_bp",
        "rate_e4",
        F.expr("rate_e4 div 10000").cast("bigint").alias("epochs"),
        (F.col("rate_e4") % 10000).cast("bigint").alias("rem_e4"),
    )


def assign_copies(
    df: DataFrame,
    plan: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    out_col: str = "copies",
) -> DataFrame:
    """Join the O(|groups|) plan (broadcast) onto the corpus and assign
    each document its exact copy count: ``epochs`` full passes plus one
    more iff its md5 bucket falls below the remainder.  Map-side only;
    groups missing from the plan get 0 copies."""
    j = df.withColumn("_mix_grp", _grp(group_col)).join(
        F.broadcast(plan.select("grp", "epochs", "rem_e4")),
        F.col("_mix_grp") == F.col("grp"),
        "left",
    )
    copies = F.coalesce(F.col("epochs"), F.lit(0)) + F.when(
        _bucket_e4(id_col) < F.coalesce(F.col("rem_e4"), F.lit(0)),
        F.lit(1),
    ).otherwise(F.lit(0))
    return j.withColumn(out_col, copies.cast("bigint")).drop(
        "_mix_grp", "grp", "epochs", "rem_e4"
    )


def materialize(
    df: DataFrame, copies_col: str = "copies", epoch_col: str = "epoch"
) -> DataFrame:
    """Explode each document into ``copies`` rows tagged with a 1-based
    ``epoch`` index (downsampled docs appear once with epoch 1; an
    upsampled doc appears once per epoch).  Output size is the budget;
    the input is scanned once."""
    kept = df.filter(F.col(copies_col) > 0)
    return kept.withColumn(
        epoch_col,
        F.explode(F.sequence(F.lit(1), F.col(copies_col).cast("int"))),
    )


def mixture_summary(
    df_with_copies: DataFrame, group_col: str, copies_col: str = "copies"
) -> DataFrame:
    """Per-group outcome of the plan: available vs sampled counts and
    the achieved share of the sampled corpus in basis points (exact
    integer division; the bounded-window totals pattern again)."""
    g = _grp(group_col)
    agg = df_with_copies.select(
        g.alias("grp"), F.col(copies_col).alias("_c")
    ).groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_available"),
        F.sum("_c").alias("n_sampled"),
    )
    wall = Window.partitionBy()
    return (
        agg.withColumn("_tot", F.sum("n_sampled").over(wall))
        .withColumn(
            "achieved_bp",
            F.expr("(n_sampled * 10000) div _tot").cast("bigint"),
        )
        .drop("_tot")
    )
