"""Coverage-gap queries: remaining SURVEY §2 rows not yet in the catalog.

P1 (conjunctive lookup), P11 (masked in-place update), P15 (existence
guard), J6 (re-join computed per-entity results), J11 (self-join compare),
J14 (label join), A27 (axis-reduce surfaces), O4 (deterministic ordering),
F13 (2D index flatten), F14 (meshgrid generation), F15 (boolean XOR),
F17 (dot-product projection), M7 (grouped-map returning a matrix per group,
exploded back to rows). Same cross-engine determinism rules as catalog.py.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import SparkSession, Window

from bigdatabowl_spark.functions.scalar import dec, dec_sum
from bigdatabowl_spark.plans.catalog import register, t, dsum

# --------------------------------------------------------------------------
# Filters / conditional updates / guards
# --------------------------------------------------------------------------


@register(
    "p1_conjunctive_lookup",
    "P1,P4,P6,O1",
    """
    SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity
    FROM lineitem
    WHERE l_returnflag = 'A' AND l_linestatus = 'F'
      AND l_quantity BETWEEN 10 AND 15
    """,
)
def p1_conjunctive_lookup(spark: SparkSession, sf_dir: str):
    """Conjunctive equality + range lookup — the reference's play fetch
    `track_df[(playId==p)&(gameId==g)]` (play_eppa_cpu.py:92,
    optimize_def.py:145). At scale both conjuncts push into the parquet
    scan (PushedFilters), so a play lookup touches only matching row
    groups — no full-table pass."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "A")
        & (F.col("l_linestatus") == "F")
        & F.col("l_quantity").between(10, 15)
    ).select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")


_MIRROR = "CASE WHEN event_type = 'click' THEN 120.0 - value ELSE value END"
_WRAP = "(value + 180.0) - 360.0 * floor((value + 180.0) / 360.0)"


@register(
    "p11_masked_update",
    "P11,F5,F6,P10",
    f"""
    SELECT event_type,
           {dsum(_MIRROR)} AS sum_mirrored,
           {dsum(_WRAP, 28, 10)} AS sum_wrapped
    FROM events
    GROUP BY event_type
    """,
)
def p11_masked_update(spark: SparkSession, sf_dir: str):
    """Masked in-place update — mirror left-direction plays into a canonical
    frame (normalize.py:44,51-55): `x = when(mask, 120-x).otherwise(x)` plus
    the (o+180)%360 angle wrap. Pure Column expressions, no copy of the
    unmasked rows."""
    ev = t(spark, sf_dir, "events")
    v = F.col("value")
    mirrored = F.when(F.col("event_type") == "click", 120.0 - v).otherwise(v)
    wrapped = (v + 180.0) - 360.0 * F.floor((v + 180.0) / 360.0)
    return ev.groupBy("event_type").agg(
        dec_sum(mirrored).alias("sum_mirrored"),
        dec_sum(wrapped, 28, 10).alias("sum_wrapped"),
    )


@register(
    "p15_existence_guard",
    "P15,A15,P3",
    """
    WITH flags AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase,
               MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS has_error
        FROM events GROUP BY user_id
    )
    SELECT has_purchase, has_error, COUNT(*) AS n_users
    FROM flags GROUP BY has_purchase, has_error
    """,
)
def p15_existence_guard(spark: SparkSession, sf_dir: str):
    """Existence assertion per group — the reference raises unless a play's
    event set contains pass_forward and no fumble (play_eppa_cpu.py:94-98).
    Relationally: per-key boolean flags via max(when), then a census of the
    guard outcomes instead of a driver-side raise."""
    ev = t(spark, sf_dir, "events")
    flags = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("has_purchase"),
        F.max(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("has_error"),
    )
    return flags.groupBy("has_purchase", "has_error").agg(F.count("*").alias("n_users"))


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@register(
    "j6_rejoin_computed",
    "J6,A9,J2",
    """
    WITH order_rev AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS order_rev
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_returnflag,
           COUNT(*) AS n_lines,
           COUNT(CASE WHEN CAST(l_extendedprice AS DOUBLE) / order_rev > 0.5 THEN 1 END) AS n_dominant
    FROM lineitem JOIN order_rev USING (l_orderkey)
    GROUP BY l_returnflag
    """,
)
def j6_rejoin_computed(spark: SparkSession, sf_dir: str):
    """Re-join computed per-entity results onto the fact rows — proj_df
    joined back to play_df on (frameId, nflId) (play_eppa_cpu.py:668).
    The aggregate side shares the fact's shuffle key (l_orderkey), so AQE
    plans a single exchange reused by both the agg and the join."""
    li = t(spark, sf_dir, "lineitem")
    order_rev = li.groupBy("l_orderkey").agg(
        dec_sum("l_extendedprice").alias("order_rev")
    )
    joined = li.join(order_rev, "l_orderkey")
    share = F.col("l_extendedprice").cast("double") / F.col("order_rev")
    return joined.groupBy("l_returnflag").agg(
        F.count("*").alias("n_lines"),
        F.count(F.when(share > 0.5, 1)).alias("n_dominant"),
    )


@register(
    "j11_selfjoin_compare",
    "J11,J9,J2",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_pairs,
           CAST(SUM(CAST(a.o_totalprice AS DECIMAL(18,2)) - CAST(b.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS urgent_minus_low
    FROM orders a
    JOIN orders b ON a.o_custkey = b.o_custkey
    JOIN customer ON c_custkey = a.o_custkey
    WHERE a.o_orderpriority = '1-URGENT' AND b.o_orderpriority = '5-LOW'
    GROUP BY c_mktsegment
    """,
)
def j11_selfjoin_compare(spark: SparkSession, sf_dir: str):
    """Self-join compare — actual vs defense-optimized EPPA per frame
    (combined_models.ipynb · cell 23): two filtered aliases of the same
    table joined on the entity key. Both sides shuffle on o_custkey once;
    the customer dim is broadcast."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").alias("a")
    b = o.filter(F.col("o_orderpriority") == "5-LOW").alias("b")
    pairs = a.join(b, F.col("a.o_custkey") == F.col("b.o_custkey")).join(
        F.broadcast(c), F.col("c_custkey") == F.col("a.o_custkey")
    )
    diff = dec("a.o_totalprice") - dec("b.o_totalprice")
    return pairs.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_pairs"),
        F.sum(diff).cast("double").alias("urgent_minus_low"),
    )


@register(
    "j14_label_join",
    "J14,J9,U3",
    f"""
    SELECT r_name AS region_label,
           COUNT(*) AS n_suppliers,
           {dsum('s_acctbal')} AS total_acctbal
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    GROUP BY r_name
    """,
)
def j14_label_join(spark: SparkSession, sf_dir: str):
    """Label-table enrichment join — coverage labels joined onto play
    aggregates (eppa_analysis_all_plays.ipynb · cell 12). Two broadcast
    hops (nation, region) then aggregate; zero shuffles on the label side."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy(F.col("r_name").alias("region_label"))
        .agg(
            F.count("*").alias("n_suppliers"),
            dec_sum("s_acctbal").alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# Aggregations / ordering
# --------------------------------------------------------------------------


@register(
    "a27_axis_reduce",
    "A27,A1,A12",
    f"""
    WITH cell AS (
        SELECT user_id, event_type,
               {dsum('value')} AS cell_sum
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           MAX(cell_sum) AS max_over_axis,
           CAST(SUM(CAST(cell_sum AS DECIMAL(18,2))) AS DOUBLE) AS sum_over_axis,
           COUNT(*) AS n_cells
    FROM cell GROUP BY user_id
    """,
)
def a27_axis_reduce(spark: SparkSession, sf_dir: str):
    """Axis-reduce over a 2D surface — `eppa.max(axis=1)` / `.sum(axis=1)`
    collapsing the time-of-flight axis of the (F,T) surface
    (play_eppa_cpu.py:621-637). Relationally: (f,T) cells then groupBy(f);
    Spark's partial aggregation makes the second reduce map-side."""
    ev = t(spark, sf_dir, "events")
    cell = ev.groupBy("user_id", "event_type").agg(dec_sum("value").alias("cell_sum"))
    return cell.groupBy("user_id").agg(
        F.max("cell_sum").alias("max_over_axis"),
        F.sum(dec("cell_sum")).cast("double").alias("sum_over_axis"),
        F.count("*").alias("n_cells"),
    )


@register(
    "o4_deterministic_order",
    "O4,U2,O1",
    """
    SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus, l_linenumber
    """,
)
def o4_deterministic_order(spark: SparkSession, sf_dir: str):
    """Deterministic work-list ordering — `sorted(set(zip(gameId, playId)))`
    (comb_model_big_run_cpu.py:22-23): distinct + total order so a resumed
    run visits plays in the same sequence."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_linestatus", "l_linenumber")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus", "l_linenumber")
    )


# --------------------------------------------------------------------------
# Scalar / grid functions
# --------------------------------------------------------------------------


@register(
    "f13_flat_index",
    "F13,F3,F6",
    """
    WITH idx AS (
        SELECT LEAST(GREATEST(CAST(floor(value) AS BIGINT), 0), 119) AS ix,
               CAST(user_id % 55 AS BIGINT) AS iy
        FROM events
    )
    SELECT iy * 120 + ix AS flat, COUNT(*) AS n
    FROM idx GROUP BY flat
    """,
)
def f13_flat_index(spark: SparkSession, sf_dir: str):
    """2D→1D index flatten — `ravel_multi_index` as y·120+x
    (play_eppa_cpu.py:352, frame_eppa.py:284) with clip-to-field bounds.
    Integer arithmetic end-to-end: exact across engines."""
    ev = t(spark, sf_dir, "events")
    ix = F.least(F.greatest(F.floor("value").cast("long"), F.lit(0)), F.lit(119))
    iy = (F.col("user_id") % 55).cast("long")
    return (
        ev.select((iy * 120 + ix).alias("flat"))
        .groupBy("flat")
        .agg(F.count("*").alias("n"))
    )


@register(
    "f14_meshgrid",
    "F14,J12,F13",
    """
    SELECT x, y, y * 120 + x AS flat,
           round(0.5 + CAST(x AS DOUBLE), 1) AS cell_x,
           round(0.5 + CAST(y AS DOUBLE), 1) AS cell_y
    FROM (SELECT unnest(generate_series(0, 119)) AS x)
    CROSS JOIN (SELECT unnest(generate_series(0, 54)) AS y)
    """,
)
def f14_meshgrid(spark: SparkSession, sf_dir: str):
    """linspace/meshgrid field-grid generation (consts.py:5-10,
    completion_probability_torch.py:246-251): `sequence()` + explode +
    crossJoin. The 6,600-cell grid is a broadcast-sized dimension — at
    scale it cross-joins against per-frame players as a broadcast nested
    loop, never a shuffle."""
    xs = spark.range(1).select(F.explode(F.sequence(F.lit(0), F.lit(119))).alias("x"))
    ys = spark.range(1).select(F.explode(F.sequence(F.lit(0), F.lit(54))).alias("y"))
    return xs.crossJoin(F.broadcast(ys)).select(
        "x",
        "y",
        (F.col("y") * 120 + F.col("x")).alias("flat"),
        F.round(0.5 + F.col("x").cast("double"), 1).alias("cell_x"),
        F.round(0.5 + F.col("y").cast("double"), 1).alias("cell_y"),
    )


@register(
    "f15_xor_flags",
    "F15,P10,A7",
    """
    WITH flags AS (
        SELECT user_id,
               (event_type = 'click') <> (value > 50.0) AS control
        FROM events
    )
    SELECT control, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
    FROM flags GROUP BY control
    """,
)
def f15_xor_flags(spark: SparkSession, sf_dir: str):
    """Boolean XOR — control = DEF ⊻ caught
    (completion_probability_torch.py:110-111): `(a != b)` on booleans."""
    ev = t(spark, sf_dir, "events")
    control = (F.col("event_type") == "click") != (F.col("value") > 50.0)
    return (
        ev.select("user_id", control.alias("control"))
        .groupBy("control")
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "f17_dot_projection",
    "F17,F1,F2,F6",
    """
    SELECT event_id,
           round(value * cos(radians(CAST(user_id % 360 AS DOUBLE)))
                 + CAST(user_id % 100 AS DOUBLE) * sin(radians(CAST(user_id % 360 AS DOUBLE))), 6) AS v_proj
    FROM events
    """,
)
def f17_dot_projection(spark: SparkSession, sf_dir: str):
    """Velocity-on-direction dot product — v·d̂ projection
    (play_eppa_cpu.py:254). Rounded to absorb libm-vs-JVM last-ulp trig
    differences (catalog.py determinism rules)."""
    ev = t(spark, sf_dir, "events")
    theta = F.radians((F.col("user_id") % 360).cast("double"))
    vy = (F.col("user_id") % 100).cast("double")
    proj = F.col("value") * F.cos(theta) + vy * F.sin(theta)
    return ev.select("event_id", F.round(proj, 6).alias("v_proj"))


# --------------------------------------------------------------------------
# M7 — grouped-map returning a matrix per group, exploded to rows
# --------------------------------------------------------------------------

_M7_SCHEMA = "event_type string, vbin long, hbin long, n long, p double"


def _m7_matrix(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group 2D probability matrix (value-decile × hour-of-day),
    normalized within the group — the reference's
    `groupby.apply(get_L_T_given_t)` returning an (F,T) matrix
    (target_probability.ipynb · cells 5-6), exploded to (bin, bin, p) rows.
    p = n/total is a single IEEE division → deterministic vs the oracle."""
    vbin = pdf["value"].clip(0, 199).floordiv(20).astype("int64")
    hbin = (pdf["ts_us"] // 3_600_000_000) % 24
    g = (
        pd.DataFrame({"vbin": vbin, "hbin": hbin.astype("int64")})
        .groupby(["vbin", "hbin"], sort=True)
        .size()
        .reset_index(name="n")
    )
    g.insert(0, "event_type", pdf["event_type"].iloc[0])
    g["p"] = g["n"] / float(len(pdf))
    return g


@register(
    "m7_grouped_matrix",
    "M7,A18,A8,A9",
    """
    WITH binned AS (
        SELECT event_type,
               CAST(floor(LEAST(GREATEST(value, 0), 199) / 20) AS BIGINT) AS vbin,
               (epoch_us(ts) // 3600000000) % 24 AS hbin
        FROM events
    )
    SELECT event_type, vbin, hbin, COUNT(*) AS n,
           CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (PARTITION BY event_type) AS p
    FROM binned GROUP BY event_type, vbin, hbin
    """,
)
def m7_grouped_matrix(spark: SparkSession, sf_dir: str):
    """Grouped-map UDF returning a matrix per group via applyInPandas,
    exploded back to relational rows (M7). Groups = event types (low
    cardinality here; at scale the group key is (gameId, playId) with
    millions of groups — one Arrow batch per group, no driver involvement)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.select("event_type", "value", "ts_us")
        .groupBy("event_type")
        .applyInPandas(_m7_matrix, schema=_M7_SCHEMA)
    )
