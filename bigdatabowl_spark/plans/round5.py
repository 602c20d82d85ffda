"""Round-5 queries: driver-checkable read-sides for the kernel chains.

The ten rows-only kernel entries (eppa_*, m2_value_model_width,
m6_optimize_defense, s4_prior_artifact_lifecycle, a7b_approx_sketches,
a20b_gamma_mle_fit, analytics_player_rankings, analytics_throw_calibration)
pair a non-SQL-expressible Arrow kernel with a pure-SQL analytics read side —
exactly the split the reference has between play_eppa_cpu.py (kernel) and
eppa_analysis_all_plays.ipynb · cells 2-5 (pandas reads over the per-play
pickle dirs). Each kernel query now persists its output table to the fixed
staging dir (plans/eppa_queries.py::materialize_kernel); the *_readside
queries here run the notebook-style aggregation over that SAME parquet in
both engines, so the analytics half of every chain gets a real cross-engine
hash verdict while kernel numerics stay pinned by tests/test_kernels.py.

Cross-engine determinism: both engines read identical float64 bytes, so
MIN/MAX and comparisons are exact; SUMs of doubles are order-sensitive, so
every summed measure is floor-quantized to integer micro-units first
(floor(x*1e6) is the same IEEE op in both engines and integer sums are
order-free). Catalog order guarantees the kernel query materializes before
its readside oracle runs (the harness and driver process queries in
catalog/_RUN_FIRST order).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bigdatabowl_spark.plans.catalog import register, t
from bigdatabowl_spark.plans.eppa_queries import KERNEL_OUT


import os

# Kernel-chain catalog queries whose builders stage their output table under
# KERNEL_OUT (via materialize_kernel). Readside builders self-heal a cold
# staging dir by invoking the owning kernel query first.
STAGED_KERNELS = (
    "eppa_field_surface",
    "eppa_pass_summary",
    "eppa_player_stats",
    "m2_value_model_width",
    "m6_optimize_defense",
    "s4_prior_artifact_lifecycle",
    "a20b_gamma_mle_fit",
    "analytics_player_rankings",
    "analytics_throw_calibration",
)


def _kparquet(name: str) -> str:
    """DuckDB glob over a staged kernel table (Spark writes a part-file dir)."""
    return f"read_parquet('{KERNEL_OUT}/{name}/*.parquet')"


def _staged(name: str, sf_dir: str) -> bool:
    """True iff the staged table exists AND was built from this sf_dir."""
    from bigdatabowl_spark.plans.eppa_queries import staged_fresh

    return staged_fresh(name, sf_dir)


def ensure_kernel_staged(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = STAGED_KERNELS
) -> None:
    """Run any kernel-chain query whose staged output is missing or was
    built from a DIFFERENT sf_dir (the builders write eagerly via
    materialize_kernel, stamping the marker). Idempotent and cheap when
    everything is already staged from this scale."""
    from bigdatabowl_spark.plans.catalog import CATALOG

    for qname in names:
        if not _staged(qname, sf_dir):
            CATALOG[qname].builder(spark, sf_dir)


def _kread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_kernel_staged(spark, sf_dir, (name,))
    return spark.read.parquet(f"{KERNEL_OUT}/{name}")


def _q(col: str):
    """Floor-quantize a double to integer micro-units (order-free summable)."""
    return F.floor(F.col(col) * F.lit(1000000.0))


def _qsql(expr: str) -> str:
    return f"CAST(floor({expr} * 1000000.0) AS BIGINT)"


@register(
    "eppa_surface_readside",
    "M3,M9,A1,A12",
    f"""
    SELECT gameId, playId, frameId,
           COUNT(*) AS n_cells,
           CAST(SUM({_qsql('eppa1')}) AS BIGINT) AS q_eppa1_sum,
           CAST(SUM({_qsql('ppc_off')}) AS BIGINT) AS q_ppc_off_sum,
           MAX(eppa1) AS max_eppa1_cell,
           CAST(SUM(invariant_violations) AS BIGINT) AS viol
    FROM {_kparquet('eppa_field_surface')}
    GROUP BY gameId, playId, frameId
    """,
)
def eppa_surface_readside(spark: SparkSession, sf_dir: str):
    """Field-surface read side: per-frame totals over the 6,600-cell EPPA
    surface staged by eppa_field_surface — the notebook's per-frame rollup
    (eppa_analysis_all_plays.ipynb · cell 3) as an oracle-checked aggregate
    over the materialized kernel table."""
    s = _kread(spark, sf_dir, "eppa_field_surface")
    return s.groupBy("gameId", "playId", "frameId").agg(
        F.count("*").alias("n_cells"),
        F.sum(_q("eppa1")).alias("q_eppa1_sum"),
        F.sum(_q("ppc_off")).alias("q_ppc_off_sum"),
        F.max("eppa1").alias("max_eppa1_cell"),
        F.sum("invariant_violations").alias("viol"),
    )


@register(
    "eppa_pass_readside",
    "M3,A26,W4,A1",
    f"""
    WITH src AS (SELECT * FROM {_kparquet('eppa_pass_summary')}),
    agg AS (
        SELECT gameId, playId,
               COUNT(*) AS n_frames,
               CAST(SUM({_qsql('eppa1_tot')}) AS BIGINT) AS q_tot_sum,
               MAX(eppa1_tot) AS max_tot,
               CAST(SUM(invariant_violations) AS BIGINT) AS viol
        FROM src GROUP BY gameId, playId
    ),
    best AS (
        SELECT gameId, playId, frameId AS best_frame
        FROM (SELECT gameId, playId, frameId,
                     row_number() OVER (PARTITION BY gameId, playId
                                        ORDER BY eppa1_tot DESC, frameId ASC) AS rn
              FROM src)
        WHERE rn = 1
    )
    SELECT a.gameId, a.playId, a.n_frames, a.q_tot_sum, a.max_tot, a.viol,
           b.best_frame
    FROM agg a JOIN best b ON a.gameId = b.gameId AND a.playId = b.playId
    """,
)
def eppa_pass_readside(spark: SparkSession, sf_dir: str):
    """Pass-summary read side: per-play frame count, quantized EPPA total,
    and the argmax frame with a deterministic tiebreak — the notebook's
    per-play best-frame rollup (eppa_analysis.ipynb · cells 4,9) over the
    staged kernel table."""
    src = _kread(spark, sf_dir, "eppa_pass_summary")
    agg = src.groupBy("gameId", "playId").agg(
        F.count("*").alias("n_frames"),
        F.sum(_q("eppa1_tot")).alias("q_tot_sum"),
        F.max("eppa1_tot").alias("max_tot"),
        F.sum("invariant_violations").alias("viol"),
    )
    w = Window.partitionBy("gameId", "playId").orderBy(
        F.desc("eppa1_tot"), F.asc("frameId")
    )
    best = (
        src.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("gameId", "playId", F.col("frameId").alias("best_frame"))
    )
    return agg.join(best, ["gameId", "playId"])


@register(
    "eppa_player_readside",
    "M3,A24,A9,A7",
    f"""
    SELECT gameId, playId, team_pos,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT nflId) AS n_players,
           CAST(SUM({_qsql('ind_eppa1')}) AS BIGINT) AS q_ind_sum,
           CAST(SUM(invariant_violations) AS BIGINT) AS viol
    FROM {_kparquet('eppa_player_stats')}
    GROUP BY gameId, playId, team_pos
    """,
)
def eppa_player_readside(spark: SparkSession, sf_dir: str):
    """Player-attribution read side: per-(play, side) head counts and
    quantized attribution mass (eppa_analysis_all_plays.ipynb · cell 4's
    per-player groupby) over the staged kernel table."""
    s = _kread(spark, sf_dir, "eppa_player_stats")
    return s.groupBy("gameId", "playId", "team_pos").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("nflId").alias("n_players"),
        F.sum(_q("ind_eppa1")).alias("q_ind_sum"),
        F.sum("invariant_violations").alias("viol"),
    )


@register(
    "m2_width_readside",
    "M1,M2,M3,A1",
    f"""
    SELECT gameId, playId,
           COUNT(*) AS n_frames,
           CAST(SUM({_qsql('eppa1_tot')}) AS BIGINT) AS q_tot_sum,
           CAST(SUM({_qsql('max_eppa1')}) AS BIGINT) AS q_max_sum,
           CAST(SUM(invariant_violations) AS BIGINT) AS viol
    FROM {_kparquet('m2_value_model_width')}
    GROUP BY gameId, playId
    """,
)
def m2_width_readside(spark: SparkSession, sf_dir: str):
    """Full-inference-width read side: per-play quantized totals of the
    264k-row value-model pass staged by m2_value_model_width
    (play_eppa_cpu.py:424-459 consumer view)."""
    s = _kread(spark, sf_dir, "m2_value_model_width")
    return s.groupBy("gameId", "playId").agg(
        F.count("*").alias("n_frames"),
        F.sum(_q("eppa1_tot")).alias("q_tot_sum"),
        F.sum(_q("max_eppa1")).alias("q_max_sum"),
        F.sum("invariant_violations").alias("viol"),
    )


@register(
    "m6_defense_readside",
    "M6,A1,A7",
    f"""
    SELECT gameId, playId,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT nflId) AS n_defenders,
           CAST(SUM({_qsql('eppa_before')}) AS BIGINT) AS q_before,
           CAST(SUM({_qsql('eppa_after')}) AS BIGINT) AS q_after,
           CAST(SUM(CASE WHEN eppa_after <= eppa_before THEN 1 ELSE 0 END)
                AS BIGINT) AS n_improved,
           CAST(SUM(invariant_violations) AS BIGINT) AS viol
    FROM {_kparquet('m6_optimize_defense')}
    GROUP BY gameId, playId
    """,
)
def m6_defense_readside(spark: SparkSession, sf_dir: str):
    """Defensive-optimizer read side: per-play before/after EPPA mass and
    the count of defenders whose greedy placement did not regress —
    optimize_def.py:129-139's summary print as an oracle-checked table."""
    s = _kread(spark, sf_dir, "m6_optimize_defense")
    return s.groupBy("gameId", "playId").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("nflId").alias("n_defenders"),
        F.sum(_q("eppa_before")).alias("q_before"),
        F.sum(_q("eppa_after")).alias("q_after"),
        F.sum(
            F.when(F.col("eppa_after") <= F.col("eppa_before"), 1).otherwise(0)
        ).alias("n_improved"),
        F.sum("invariant_violations").alias("viol"),
    )


@register(
    "s4_lifecycle_readside",
    "S4,S5,A1",
    f"""
    SELECT gameId, playId,
           COUNT(*) AS n_frames,
           bool_and(bitexact) AS all_bitexact,
           CAST(SUM({_qsql('eppa1_tot')}) AS BIGINT) AS q_tot_sum,
           MAX(max_eppa1) AS max_m,
           CAST(SUM(invariant_violations) AS BIGINT) AS viol
    FROM {_kparquet('s4_prior_artifact_lifecycle')}
    GROUP BY gameId, playId
    """,
)
def s4_lifecycle_readside(spark: SparkSession, sf_dir: str):
    """Prior-lifecycle read side: per-play certification that the
    reloaded-prior rerun stayed bit-identical (all_bitexact must be true
    everywhere — play_eppa_cpu.py:72-77's artifact contract) plus the
    quantized EPPA totals, over the staged certification table."""
    s = _kread(spark, sf_dir, "s4_prior_artifact_lifecycle")
    return s.groupBy("gameId", "playId").agg(
        F.count("*").alias("n_frames"),
        F.bool_and("bitexact").alias("all_bitexact"),
        F.sum(_q("eppa1_tot")).alias("q_tot_sum"),
        F.max("max_eppa1").alias("max_m"),
        F.sum("invariant_violations").alias("viol"),
    )


@register(
    "a7c_sketch_certify",
    "A7,A10,M8",
    """
    WITH ranked AS (
        SELECT l_returnflag, l_extendedprice,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice ASC) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    ),
    quant AS (
        SELECT l_returnflag,
               MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                        THEN l_extendedprice END) AS p50_disc,
               MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                        THEN l_extendedprice END) AS p95_disc
        FROM ranked GROUP BY l_returnflag
    ),
    ex AS (
        SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_orders
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT e.l_returnflag, e.exact_orders, q.p50_disc, q.p95_disc,
           TRUE AS hll_ok, TRUE AS p50_ok, TRUE AS p95_ok
    FROM ex e JOIN quant q ON e.l_returnflag = q.l_returnflag
    """,
)
def a7c_sketch_certify(spark: SparkSession, sf_dir: str):
    """Driver-checkable sketch certification (the oracle-checked half of
    a7b_approx_sketches): the exact aggregates — distinct orders and the
    discrete p50/p95 picked by explicit row_number (an actual data value,
    so bit-exact across engines, sidestepping interpolated-percentile ulp
    drift) — plus booleans asserting the HLL++ and KLL sketches land
    within the 5% bound. The oracle recomputes the exact side from
    lineitem and emits TRUE for the bounds, so a hash match certifies
    sketch accuracy cross-engine, not just in-repo (A7/A10/M8; exact twins
    a7_distinct_counts / a10_quantiles)."""
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(F.asc("l_extendedprice"))
    wn = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    quant = ranked.groupBy("l_returnflag").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(0.5) * F.col("n")).cast("long"),
                F.col("l_extendedprice"),
            )
        ).alias("p50_disc"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(0.95) * F.col("n")).cast("long"),
                F.col("l_extendedprice"),
            )
        ).alias("p95_disc"),
    )
    sk = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("_approx_orders"),
        F.percentile_approx("l_extendedprice", [0.5, 0.95], 10000).alias("_q"),
    )
    joined = sk.join(quant, "l_returnflag")
    rel = lambda a, b: F.abs(a - b) / b  # noqa: E731
    return joined.select(
        "l_returnflag",
        "exact_orders",
        "p50_disc",
        "p95_disc",
        (rel(F.col("_approx_orders"), F.col("exact_orders")) <= 0.05).alias("hll_ok"),
        (rel(F.col("_q")[0], F.col("p50_disc")) <= 0.05).alias("p50_ok"),
        (rel(F.col("_q")[1], F.col("p95_disc")) <= 0.05).alias("p95_ok"),
    )


@register(
    "a20b_mle_readside",
    "A20,A21,M8",
    f"""
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           {_qsql('shape_mle')} AS q_shape_mle,
           {_qsql('scale_mle')} AS q_scale_mle,
           (loglik_mle >= loglik_mom - 0.000001 * abs(loglik_mom)) AS mle_dominates,
           CAST(invariant_violations AS BIGINT) AS viol
    FROM {_kparquet('a20b_gamma_mle_fit')}
    WHERE NOT isnan(shape_mle)
    """,
)
def a20b_mle_readside(spark: SparkSession, sf_dir: str):
    """Gamma-MLE read side: the fitted (shape, scale) per event_type,
    quantized, plus the recomputed MLE-optimality certificate
    (loglik_mle >= loglik_mom — the estimator's defining property,
    historical-L-T.ipynb · cell 12's fit table) over the staged fit
    table. Both engines evaluate the certificate on identical float64
    bytes, so the boolean is deterministic. Degenerate groups (fewer than
    2 positive samples fit to NaN, kernels/priors.py:73) are filtered in
    BOTH engines — DuckDB would otherwise error on CAST(NaN AS BIGINT)
    where Spark yields null (ADVICE r5)."""
    s = _kread(spark, sf_dir, "a20b_gamma_mle_fit")
    return s.filter(~F.isnan("shape_mle")).select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        _q("shape_mle").alias("q_shape_mle"),
        _q("scale_mle").alias("q_scale_mle"),
        (
            F.col("loglik_mle")
            >= F.col("loglik_mom") - F.lit(0.000001) * F.abs(F.col("loglik_mom"))
        ).alias("mle_dominates"),
        F.col("invariant_violations").cast("long").alias("viol"),
    )


@register(
    "rankings_readside",
    "A1,A9,O2,M3",
    f"""
    SELECT team_pos,
           COUNT(*) AS n_players,
           CAST(SUM(n_plays) AS BIGINT) AS total_plays,
           CAST(SUM({_qsql('weighted_eppa')}) AS BIGINT) AS q_eppa_sum,
           CAST(SUM(invariant_violations) AS BIGINT) AS viol
    FROM {_kparquet('analytics_player_rankings')}
    GROUP BY team_pos
    """,
)
def rankings_readside(spark: SparkSession, sf_dir: str):
    """Player-ranking read side: per-side roster size and quantized
    p(t)-weighted EPPA mass over the staged ranking table
    (eppa_analysis_all_plays.ipynb · cell 4's leaderboard rollup)."""
    s = _kread(spark, sf_dir, "analytics_player_rankings")
    return s.groupBy("team_pos").agg(
        F.count("*").alias("n_players"),
        F.sum("n_plays").alias("total_plays"),
        F.sum(_q("weighted_eppa")).alias("q_eppa_sum"),
        F.sum("invariant_violations").alias("viol"),
    )


@register(
    "calibration_readside",
    "A19,A14,M3",
    f"""
    SELECT COUNT(*) AS n_bins,
           CAST(SUM(n) AS BIGINT) AS total_passes,
           CAST(SUM({_qsql('mean_predicted')}) AS BIGINT) AS q_pred_sum,
           CAST(SUM({_qsql('empirical_rate')}) AS BIGINT) AS q_emp_sum,
           CAST(SUM(invariant_violations) AS BIGINT) AS viol
    FROM {_kparquet('analytics_throw_calibration')}
    """,
)
def calibration_readside(spark: SparkSession, sf_dir: str):
    """Calibration read side: bin count, pass mass, and quantized
    predicted/empirical rate totals over the staged calibration table
    (Calibration Viz.ipynb · cell 5's summary view)."""
    s = _kread(spark, sf_dir, "analytics_throw_calibration")
    return s.agg(
        F.count("*").alias("n_bins"),
        F.sum("n").alias("total_passes"),
        F.sum(_q("mean_predicted")).alias("q_pred_sum"),
        F.sum(_q("empirical_rate")).alias("q_emp_sum"),
        F.sum("invariant_violations").alias("viol"),
    )


@register(
    "stream_eppa_kernel",
    "ST1,ST8,M3,S8",
    f"""
    SELECT gameId, playId, frameId, frames_after_snap,
           eppa1_tot, max_eppa1_x, max_eppa1_y, max_eppa1_T,
           max_eppa1_ppc_off, max_eppa1_trans, max_eppa1,
           CAST(invariant_violations AS BIGINT) AS invariant_violations
    FROM {_kparquet('eppa_pass_summary')}
    """,
)
def stream_eppa_kernel(spark: SparkSession, sf_dir: str):
    """The EPPA kernel lifted to Structured Streaming, certified bit-exact
    against the batch kernel CROSS-ENGINE: tracking arrives as a file
    stream (one parquet file per play — `partitionBy(gameId, playId)` after
    a key repartition guarantees a play never splits across files, so every
    micro-batch carries only whole plays), foreachBatch runs the SAME
    applyInPandas kernel per micro-batch and appends the pass summaries to
    a parquet sink. The Spark side returns the STREAM-accumulated table;
    the DuckDB oracle reads the BATCH-staged eppa_pass_summary parquet —
    equality of every float64 proves micro-batching changed nothing.

    This is the reference's offline per-play loop (play_eppa_cpu.py:
    621-670, one pickle dir per play) as a live ingestion path: plays
    stream in as the tracking system emits them, each is scored once, and
    the summary table grows incrementally. The foreachBatch sink is
    EXACTLY-ONCE under replay: each micro-batch overwrites its own
    deterministic `batch=<id>` directory, so a batch retried after a crash
    between sink write and offset commit replaces its previous attempt
    instead of duplicating rows (ST8; ADVICE r5 — a plain append here is
    only at-least-once).

    Scale: the kernel is per-play (applyInPandas groups), so micro-batch
    composition cannot change numerics; state is only the file-source
    offset log; the sink append is one small parquet per batch. At real
    scale the play partitioning comes from the tracking producer (one
    object per play), exactly this layout.
    """
    import shutil

    from bigdatabowl_spark.kernels.eppa import eppa_pass_summary
    from bigdatabowl_spark.plans.eppa_queries import N_PLAYS, tracking_from_events

    # batch truth for the oracle (sf-marker-checked, restages on mismatch)
    ensure_kernel_staged(spark, sf_dir, ("eppa_pass_summary",))

    # staging rides KERNEL_OUT (SPARK_GRAFT_KERNEL_OUT-overridable), so the
    # documented multi-session isolation covers this query too (ADVICE r5 —
    # a fixed /tmp path let concurrent sessions rmtree each other mid-run)
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    root = os.path.join(KERNEL_OUT, "stream_eppa", tag)
    track_dir, out_dir, ckpt = f"{root}/tracking", f"{root}/out", f"{root}/_ckpt"
    for d in (track_dir, out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    norm = tracking_from_events(spark, sf_dir)
    # one play per partition, then partition dirs by play: exactly one
    # data file per play, so maxFilesPerTrigger=1 = one whole play per
    # micro-batch and the multi-batch path is actually exercised
    (
        norm.repartition(N_PLAYS, "gameId", "playId")
        .write.partitionBy("gameId", "playId")
        .parquet(track_dir)
    )

    stream = (
        spark.readStream.schema(norm.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(track_dir)
    )

    def score_batch(batch_df, batch_id: int) -> None:
        # deterministic per-batch path + overwrite = idempotent replay:
        # a crash-retried batch replaces its own output, never duplicates.
        # n_tasks=8: maxFilesPerTrigger=1 bounds a micro-batch to one
        # play's frames — the batch path's cores×3 width would schedule
        # ~90 empty tasks per batch for nothing
        eppa_pass_summary(batch_df, n_tasks=8).write.mode("overwrite").parquet(
            f"{out_dir}/batch={batch_id}"
        )

    q = (
        stream.writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(out_dir)
    return out.select(
        "gameId", "playId", "frameId", "frames_after_snap",
        "eppa1_tot", "max_eppa1_x", "max_eppa1_y", "max_eppa1_T",
        "max_eppa1_ppc_off", "max_eppa1_trans", "max_eppa1",
        F.col("invariant_violations").cast("long").alias("invariant_violations"),
    )
