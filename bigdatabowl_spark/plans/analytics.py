"""Analytics layer (SURVEY §7 Phase 4): the reference's read-side notebooks
as a library over the kernel's output tables.

The reference walks per-play pickle dirs, unions them, joins dims, and runs
p(t)-weighted grouped aggregations into rankings
(eppa_analysis_all_plays.ipynb · cells 1-12; eppa_analysis.ipynb).
Here the same reads are DataFrame functions over the kernel DataFrames —
composable with any tracking source, no filesystem walking (the sink side
is partitioned parquet, SURVEY §2.1 S10).

Registered catalog entries run the full chain tracking → kernel →
analytics; they are rows-only (the kernel stage is non-SQL-expressible) —
the relational shapes they compose (J6/J10/A9/A1/W4/A19) are each
oracle-checked standalone elsewhere in the catalog.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatabowl_spark.plans.catalog import register


def p_t_table(spark: SparkSession) -> DataFrame:
    """The p(t) throw-time prior as a broadcast-sized dimension table
    (frames_after_snap, p_t) — S4 artifact re-materialized relationally."""
    from bigdatabowl_spark.kernels.priors import p_t_prior

    p_t = p_t_prior()
    pdf = pd.DataFrame(
        {"frames_after_snap": range(1, len(p_t) + 1), "p_t": p_t}
    )
    return spark.createDataFrame(pdf)


def player_eppa_rankings(
    player_stats: DataFrame, pass_summary: DataFrame, spark: SparkSession, top_n: int = 50
) -> DataFrame:
    """p(t)-weighted per-player EPPA ranking.

    Reference: eppa_analysis_all_plays.ipynb · cells 2-4 — per-frame player
    attribution joined to the p(t) prior on frames_after_snap (J10), prior
    renormalized within each play over its observed frames (A9), weighted
    sum per player (A1), ranked (O2). frames_after_snap comes from
    re-joining the pass summary on (gameId, playId, frameId) (J6)."""
    fas = pass_summary.select("gameId", "playId", "frameId", "frames_after_snap")
    joined = player_stats.join(fas, ["gameId", "playId", "frameId"])
    with_prior = joined.join(F.broadcast(p_t_table(spark)), "frames_after_snap", "left").withColumn(
        "p_t", F.coalesce("p_t", F.lit(0.0))
    )
    w_play = Window.partitionBy("gameId", "playId", "nflId")
    renorm = with_prior.withColumn(
        "w", F.col("p_t") / F.sum("p_t").over(w_play)
    )
    per_player = renorm.groupBy("nflId", "team_pos").agg(
        F.sum(F.col("w") * F.col("ind_eppa1")).alias("weighted_eppa"),
        F.countDistinct("gameId", "playId").alias("n_plays"),
        F.sum("w").alias("_sum_w"),
    )
    # self-certification: each (play, player)'s renormalized weights sum to
    # 1, so a player's total weight mass cannot exceed their play count —
    # and the weighted score must be finite (rows-only driver check
    # exercises real semantics, like the kernel queries)
    viol = (
        (F.col("_sum_w") > F.col("n_plays") + 1e-6)
        | F.isnan("weighted_eppa")
        | F.col("weighted_eppa").isNull()
    )
    return (
        per_player.select(
            "nflId",
            "team_pos",
            "weighted_eppa",
            "n_plays",
            viol.cast("long").alias("invariant_violations"),
        )
        .orderBy(F.desc("weighted_eppa"), F.asc("nflId"))
        .limit(top_n)
    )


def play_rankings(pass_summary: DataFrame, top_n: int = 20) -> DataFrame:
    """Best-frame ranking of plays by peak hypothetical-pass EPPA
    (eppa_analysis.ipynb · cells 4,9: groupby.nlargest per play)."""
    w = Window.partitionBy("gameId", "playId").orderBy(
        F.desc("max_eppa1"), F.asc("frameId")
    )
    best = pass_summary.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.select(
            "gameId", "playId", "frameId", "max_eppa1", "max_eppa1_x",
            "max_eppa1_y", "max_eppa1_T", "eppa1_tot",
        )
        .orderBy(F.desc("max_eppa1"), F.asc("playId"))
        .limit(top_n)
    )


def throw_calibration(
    pass_summary: DataFrame, outcomes: DataFrame, n_bins: int = 10
) -> DataFrame:
    """Calibration of the kernel's best-pass transition probability against
    realized completions (Calibration Viz.ipynb · cell 5 / SURVEY §5.3):
    bucketize max_eppa1_trans, per-bin empirical completion rate (A19)."""
    last = pass_summary.groupBy("gameId", "playId").agg(
        F.max_by("max_eppa1_trans", "frameId").alias("trans_prob")
    )
    joined = last.join(outcomes.select("gameId", "playId", "completed"), ["gameId", "playId"])
    binned = joined.withColumn(
        "bin", F.least(F.floor(F.col("trans_prob") * n_bins), F.lit(n_bins - 1)).cast("int")
    )
    agged = binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.avg("trans_prob").alias("mean_predicted"),
        F.avg(F.col("completed").cast("double")).alias("empirical_rate"),
    )
    # self-certification: bins in range, rates are probabilities, bins
    # non-empty — the calibration identities a rows-only check can verify
    viol = (
        (F.col("bin") < 0)
        | (F.col("bin") >= n_bins)
        | (F.col("n") <= 0)
        | (F.col("mean_predicted") < -1e-9)
        | (F.col("mean_predicted") > 1.0 + 1e-9)
        | (F.col("empirical_rate") < -1e-9)
        | (F.col("empirical_rate") > 1.0 + 1e-9)
    )
    return agged.withColumn("invariant_violations", viol.cast("long"))


# ------------------------------------------------------- catalog entries


@register("analytics_player_rankings", "A1,A9,J6,J10,O2,M3", None)
def q_player_rankings(spark: SparkSession, sf_dir: str):
    """Full chain: tracking → EPPA kernel → p(t)-weighted player ranking.

    The kernel tables come from the shared single-pass staging
    (stage_eppa_chain) — the reference reads its per-play pickle dirs the
    same way (eppa_analysis_all_plays.ipynb · cell 2), rather than
    re-scoring every play per notebook."""
    import os

    from bigdatabowl_spark.plans.eppa_queries import (
        KERNEL_OUT,
        materialize_kernel,
        stage_eppa_chain,
    )

    stage_eppa_chain(spark, sf_dir)
    player = spark.read.parquet(os.path.join(KERNEL_OUT, "eppa_player_stats"))
    passes = spark.read.parquet(os.path.join(KERNEL_OUT, "eppa_pass_summary"))
    return materialize_kernel(
        player_eppa_rankings(player, passes, spark),
        "analytics_player_rankings",
        sf_dir,
    )


@register("analytics_throw_calibration", "A19,A14,M3,M5", None)
def q_throw_calibration(spark: SparkSession, sf_dir: str):
    """Full chain: tracking → kernel best-pass trans prob → calibration
    against the tuning dataset's realized completions. The kernel pass
    summary comes from the shared single-pass staging (stage_eppa_chain)."""
    import os

    from bigdatabowl_spark.kernels.tuning import pass_dataset
    from bigdatabowl_spark.plans.eppa_queries import (
        KERNEL_OUT,
        materialize_kernel,
        stage_eppa_chain,
        tracking_from_events,
    )

    stage_eppa_chain(spark, sf_dir)
    passes = spark.read.parquet(os.path.join(KERNEL_OUT, "eppa_pass_summary"))
    norm = tracking_from_events(spark, sf_dir)
    return materialize_kernel(
        throw_calibration(passes, pass_dataset(norm)),
        "analytics_throw_calibration",
        sf_dir,
    )
