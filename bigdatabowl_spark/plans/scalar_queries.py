"""Scalar-function and conditional-logic queries (SURVEY §2.8, §2.2).

The reference's kinematics math (normalize.py, play_eppa_cpu.py) exercised as
pure Column expressions over the testdata. Everything stays inside
WholeStageCodegen; trig outputs are rounded to absorb libm-vs-JVM last-ulp
differences.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession, Window

from bigdatabowl_spark.functions.scalar import clip, dec, dec_sum, sigmoid
from bigdatabowl_spark.plans.catalog import register, t, dsum

# --------------------------------------------------------------------------


@register(
    "f_kinematics",
    "F1,F2,F3,F4,F5,F6,F7,F8,F16,P10",
    """
    SELECT event_id,
           round(sin(radians(value)), 6) AS sin_v,
           round(cos(radians(value)), 6) AS cos_v,
           round(atan2(CAST(user_id % 100 AS DOUBLE), value + 1.0), 6) AS bearing,
           round(sqrt(value*value + CAST(user_id % 100 AS DOUBLE)*CAST(user_id % 100 AS DOUBLE)), 6) AS dist,
           CASE WHEN value < 0 THEN 0.0 WHEN value > 150 THEN 150.0 ELSE value END AS clipped,
           round(1.0 / (1.0 + exp(-(value - 100.0) / 25.0)), 6) AS sigmoid_v,
           CAST(round(value, 0) AS BIGINT) AS rounded,
           ((value + 180.0) - 360.0 * floor((value + 180.0) / 360.0)) AS wrapped,
           round(value + 1.5*0.1 + 0.5*0.8*0.1*0.1, 6) AS kin_x,
           round(2.0 + 1.2*0.5 - 0.5*10.72468*0.5*0.5, 6) AS ball_z,
           CASE WHEN value < 50 THEN value * 2.0
                WHEN value < 100 THEN value + 50.0
                WHEN value < 150 THEN value
                ELSE 150.0 END AS piecewise
    FROM events
    """,
)
def f_kinematics(spark: SparkSession, sf_dir: str):
    """Kinematics scalar library on a fact table.

    Reference: trig + hypot + clip + sigmoid + wrap + projectile math
    (normalize.py:54-82; play_eppa_cpu.py:235-269,279-297,340-351). All
    JVM-side Column expressions — zero Python in the row path.
    """
    ev = t(spark, sf_dir, "events")
    v = F.col("value")
    u = (F.col("user_id") % 100).cast("double")
    wrapped = (v + 180.0) - 360.0 * F.floor((v + 180.0) / 360.0)
    return ev.select(
        "event_id",
        F.round(F.sin(F.radians(v)), 6).alias("sin_v"),
        F.round(F.cos(F.radians(v)), 6).alias("cos_v"),
        F.round(F.atan2(u, v + 1.0), 6).alias("bearing"),
        F.round(F.sqrt(v * v + u * u), 6).alias("dist"),
        clip(v, 0.0, 150.0).alias("clipped"),
        F.round(sigmoid((v - 100.0) / 25.0), 6).alias("sigmoid_v"),
        F.round(v, 0).cast("long").alias("rounded"),
        wrapped.alias("wrapped"),
        F.round(v + F.lit(1.5 * 0.1 + 0.5 * 0.8 * 0.1 * 0.1), 6).alias("kin_x"),
        F.round(F.lit(2.0 + 1.2 * 0.5 - 0.5 * 10.72468 * 0.5 * 0.5), 6).alias("ball_z"),
        F.when(v < 50, v * 2.0)
        .when(v < 100, v + 50.0)
        .when(v < 150, v)
        .otherwise(F.lit(150.0))
        .alias("piecewise"),
    )


@register(
    "f_strings_keys",
    "F9,F10,F11,P8,P14",
    """
    SELECT c_custkey,
           string_split(c_name, '#')[-1] AS cust_num,
           c_custkey || '_' || c_nationkey AS unique_key,
           CASE c_mktsegment
                WHEN 'AUTOMOBILE' THEN 'AUTO' WHEN 'BUILDING' THEN 'BLDG'
                WHEN 'FURNITURE' THEN 'FURN' WHEN 'HOUSEHOLD' THEN 'HOME'
                WHEN 'MACHINERY' THEN 'MACH' ELSE 'OTHER' END AS segment_code,
           upper(c_mktsegment) AS segment_upper,
           length(c_name) AS name_len
    FROM customer
    """,
)
def f_strings_keys(spark: SparkSession, sf_dir: str):
    """String functions: last token, concat key, dict-map lookup.

    Reference: surname split (visualize.py:366), uniqueId concat
    (completion_probability_torch.py:43), position dict map
    (normalize.py:87-90) — the map rendered as create_map lookup.
    """
    c = t(spark, sf_dir, "customer")
    seg_map = F.create_map(
        F.lit("AUTOMOBILE"), F.lit("AUTO"),
        F.lit("BUILDING"), F.lit("BLDG"),
        F.lit("FURNITURE"), F.lit("FURN"),
        F.lit("HOUSEHOLD"), F.lit("HOME"),
        F.lit("MACHINERY"), F.lit("MACH"),
    )
    return c.select(
        "c_custkey",
        F.element_at(F.split(F.col("c_name"), "#"), -1).alias("cust_num"),
        F.concat_ws("_", F.col("c_custkey"), F.col("c_nationkey")).alias("unique_key"),
        F.coalesce(seg_map[F.col("c_mktsegment")], F.lit("OTHER")).alias("segment_code"),
        F.upper("c_mktsegment").alias("segment_upper"),
        F.length("c_name").alias("name_len"),
    )


@register(
    "f12_time_parts",
    "F12,A1,F6",
    f"""
    SELECT year(o_orderdate) AS order_year,
           quarter(o_orderdate) AS order_quarter,
           COUNT(*) AS n_orders,
           {dsum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
)
def f12_time_parts(spark: SparkSession, sf_dir: str):
    """Timestamp decomposition + grouped revenue.

    Reference: timestamp parse/diff (visualize.py:105-112) — here the
    calendar-part flavor on the NTZ order dates.
    """
    o = t(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
    ).agg(F.count("*").alias("n_orders"), dec_sum("o_totalprice").alias("revenue"))


@register(
    "p9_conditional_tiers",
    "P9,P10,P14,A1",
    f"""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                WHEN o_totalprice < 300000 THEN 'large'
                ELSE 'jumbo' END AS tier,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open' ELSE 'partial' END AS status_name,
           COUNT(*) AS n,
           {dsum('o_totalprice')} AS tier_revenue,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
    FROM orders
    GROUP BY 1, 2
    """,
)
def p9_conditional_tiers(spark: SparkSession, sf_dir: str):
    """Multi-branch conditional assignment + value replacement + one-hot.

    Reference: np.select 3-way team assignment (normalize.py:23-31), np.where
    one-hot flags (play_eppa_cpu.py:55-67), replace maps
    (completion_probability_torch.py:52-54).
    """
    o = t(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    tier = (
        F.when(tp < 50000, "small")
        .when(tp < 150000, "medium")
        .when(tp < 300000, "large")
        .otherwise("jumbo")
    )
    status = (
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
    )
    return o.groupBy(tier.alias("tier"), status.alias("status_name")).agg(
        F.count("*").alias("n"),
        dec_sum("o_totalprice").alias("tier_revenue"),
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias("n_urgent"),
    )


@register(
    "a17_autocorr",
    "A17,A16,W1",
    """
    WITH daily AS (
        SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day_idx,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
        FROM events GROUP BY 1
    ), paired AS (
        SELECT day_value AS x,
               LAG(day_value) OVER (ORDER BY day_idx) AS y
        FROM daily
    ), m AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(x AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        FROM paired WHERE y IS NOT NULL
    )
    SELECT round((n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 6) AS lag1_autocorr,
           n AS n_days
    FROM m
    """,
)
def a17_autocorr(spark: SparkSession, sf_dir: str):
    """Lag-1 autocorrelation of a per-period series.

    Reference: per-game EPPA series autocorrelation (eppa_np_anal.ipynb ·
    cells 12-16). Day sums are decimal-exact; the lag-pair moment sums run on
    a tiny series so plain double sums are ordered identically by the single
    ordered window.
    """
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.col("ts_us") / 86_400_000_000).cast("long").alias("day_idx")
    ).agg(F.sum(dec("value")).cast("double").alias("day_value"))
    w = Window.orderBy("day_idx")
    paired = daily.select(
        F.col("day_value").alias("x"), F.lag("day_value").over(w).alias("y")
    ).filter(F.col("y").isNotNull())
    # Moment sums go through DECIMAL (day_value is 2-decimal by construction)
    # so they are exact regardless of partition/accumulation order.
    dx, dy = dec("x"), dec("y")
    m = paired.agg(
        F.count("*").alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
        F.sum(dy * dy).cast("double").alias("syy"),
        F.sum(dx * dy).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    corr = (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
    return m.select(F.round(corr, 6).alias("lag1_autocorr"), n.alias("n_days"))
