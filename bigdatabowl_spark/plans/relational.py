"""Relational core queries (SURVEY §2.2–2.7): filters, joins, aggs, windows.

Each query is the Spark-first re-expression of a reference dataflow pattern
(citations in docstrings are into /root/reference) exercised on the testdata
star schema, with a DuckDB oracle twin. Scale posture: dims (region, nation,
part, supplier) are broadcast; facts shuffle only on their natural keys;
windows partition on high-cardinality keys so no single partition explodes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession, Window

from bigdatabowl_spark.functions.scalar import dec, dec_sum
from bigdatabowl_spark.plans.catalog import register, t, dsum, davg

# --------------------------------------------------------------------------
# A1/A12/P4/P6 — TPC-H-Q1-shaped pricing summary
# --------------------------------------------------------------------------


@register(
    "a1_pricing_summary",
    "A1,P4,P6,F6",
    f"""
    SELECT l_returnflag, l_linestatus,
           {dsum('l_quantity')} AS sum_qty,
           {dsum('l_extendedprice')} AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           {davg('l_quantity')} AS avg_qty,
           {davg('l_discount', 18, 2)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-06-30'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str):
    """Grouped multi-aggregate with named aliases + range predicate.

    Reference pattern: play/player ranking aggregations
    (eppa_analysis_all_plays.ipynb · cells 3-4) — groupby().agg(max/mean/sum).
    """
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-06-30").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("l_quantity")).alias("avg_qty"),
            (F.sum(dec("l_discount")).cast("double") / F.count("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "a12_two_level_agg",
    "A12,A1,J2",
    f"""
    WITH per_cust AS (
        SELECT c_custkey, c_mktsegment,
               COUNT(o_orderkey) AS n_orders,
               {dsum('o_totalprice')} AS spend
        FROM customer JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey, c_mktsegment
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
           (CAST(SUM(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) AS avg_spend,
           MAX(n_orders) AS max_orders
    FROM per_cust
    GROUP BY c_mktsegment
    """,
)
def a12_two_level_agg(spark: SparkSession, sf_dir: str):
    """Two-level aggregation: play-level then player-level rollup.

    Reference: movement_stats.ipynb · cells 3-5 (per-play max speed, then
    per-player max over plays, then per-position). Spark gets partial
    aggregation (map-side combine) for free on both levels.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dec_sum("o_totalprice").alias("spend"),
        )
    )
    return per_cust.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.sum(dec("spend")).cast("double").alias("total_spend"),
        (F.sum(dec("spend")).cast("double") / F.count("*")).alias("avg_spend"),
        F.max("n_orders").alias("max_orders"),
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@register(
    "j1_broadcast_enrich",
    "J1,J9,A1",
    """
    SELECT p_brand,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def j1_broadcast_enrich(spark: SparkSession, sf_dir: str):
    """Fact ⋈ broadcast dimension enrichment.

    Reference: tracking ⋈ games on gameId (normalize.py:22); player_stats ⋈
    players (eppa_analysis_all_plays.ipynb · cells 1,7). `part` is tiny vs
    lineitem → explicit broadcast keeps this shuffle-free on the fact side.
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "j3_region_rollup",
    "J3,J1,A1",
    f"""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COUNT(c_custkey) AS n_customers,
           {dsum('c_acctbal')} AS sum_acctbal
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    GROUP BY ROLLUP(r_name)
    """,
)
def j3_region_rollup(spark: SparkSession, sf_dir: str):
    """Snowflake join with mismatched key names + ROLLUP super-aggregate.

    Reference: plays ⋈ nflfastR pbp on gameId↔old_game_id
    (play_eppa_cpu.py:53); rollup is the SURVEY §2.4 note ("expose rollup
    anyway — free in Spark").
    """
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    joined = r.join(
        F.broadcast(n), n.n_regionkey == r.r_regionkey
    ).join(c, c.c_nationkey == n.n_nationkey)
    return (
        joined.rollup("r_name")
        .agg(F.count("c_custkey").alias("n_customers"), dec_sum("c_acctbal").alias("sum_acctbal"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
            "n_customers",
            "sum_acctbal",
        )
    )


@register(
    "j4_derived_scalar",
    "J4,A1,F12",
    """
    WITH first_ship AS (
        SELECT l_orderkey, MIN(l_shipdate) AS first_ship
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT o_orderkey,
           DATEDIFF('day', CAST(o_orderdate AS DATE), CAST(first_ship AS DATE)) AS ship_lag_days
    FROM orders JOIN first_ship ON l_orderkey = o_orderkey
    """,
)
def j4_derived_scalar(spark: SparkSession, sf_dir: str):
    """Per-group derived scalar broadcast back to rows.

    Reference: per-play line-of-scrimmage extracted from the ball_snap row and
    joined back onto every tracking row (normalize.py:35-37).
    """
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    first_ship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("first_ship"))
    return o.join(first_ship, first_ship.l_orderkey == o.o_orderkey).select(
        "o_orderkey",
        F.datediff(F.col("first_ship").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "ship_lag_days"
        ),
    )


@register(
    "j5_derived_key_join",
    "J5,U3,A1,F6",
    f"""
    WITH monthly_rev AS (
        SELECT year(l_shipdate)*100 + month(l_shipdate) AS ym,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem GROUP BY 1
    ), monthly_orders AS (
        SELECT year(o_orderdate)*100 + month(o_orderdate) AS ym,
               COUNT(*) AS n_orders,
               {dsum('o_totalprice')} AS order_value
        FROM orders GROUP BY 1
    )
    SELECT monthly_rev.ym AS ym, revenue, n_orders, order_value
    FROM monthly_rev JOIN monthly_orders ON monthly_rev.ym = monthly_orders.ym
    """,
)
def j5_derived_key_join(spark: SparkSession, sf_dir: str):
    """Join on a computed/binned key; column-wise concat of aligned aggregates.

    Reference: xyac ⋈ EPA on rounded play_endpoint_x (play_eppa_cpu.py:460-472)
    and aligned-aggregate concat (eppa_analysis.ipynb · cell 5).
    """
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    ym_l = (F.year("l_shipdate") * 100 + F.month("l_shipdate")).alias("ym")
    ym_o = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym")
    monthly_rev = li.groupBy(ym_l).agg(
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
        .cast("double")
        .alias("revenue")
    )
    monthly_orders = o.groupBy(ym_o).agg(
        F.count("*").alias("n_orders"), dec_sum("o_totalprice").alias("order_value")
    )
    return monthly_rev.join(monthly_orders, "ym").select("ym", "revenue", "n_orders", "order_value")


@register(
    "j7_event_span",
    "J7,J8,P3,A1",
    """
    WITH signup AS (
        SELECT user_id, MIN(epoch_us(ts)) AS signup_us
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), last_purchase AS (
        SELECT user_id, MAX(epoch_us(ts)) AS last_purchase_us
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT signup.user_id AS user_id, signup_us, last_purchase_us,
           last_purchase_us - signup_us AS span_us
    FROM signup JOIN last_purchase ON signup.user_id = last_purchase.user_id
    WHERE last_purchase_us > signup_us
    """,
)
def j7_event_span(spark: SparkSession, sf_dir: str):
    """Two-phase self-join of event-filtered aliases + post-join filter.

    Reference: ball-start (pass_forward row) ⋈ ball-end (pass_arrived row) per
    play (completion_probability_torch.py:70-85) with out-of-bounds anti-filter
    after the join (:81-82).
    """
    ev = t(spark, sf_dir, "events")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("signup_us"))
    )
    last_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.max("ts_us").alias("last_purchase_us"))
    )
    return (
        signup.join(last_purchase, "user_id")
        .filter(F.col("last_purchase_us") > F.col("signup_us"))
        .select(
            "user_id",
            "signup_us",
            "last_purchase_us",
            (F.col("last_purchase_us") - F.col("signup_us")).alias("span_us"),
        )
    )


@register(
    "j13_range_join",
    "J13,J8,A7",
    """
    SELECT e.event_id AS event_id, e.user_id AS user_id,
           COUNT(p.event_id) AS purchases_10min_before
    FROM events e
    LEFT JOIN events p
      ON p.user_id = e.user_id
     AND p.event_type = 'purchase'
     AND epoch_us(p.ts) >= epoch_us(e.ts) - 600000000
     AND epoch_us(p.ts) < epoch_us(e.ts)
    WHERE e.event_type = 'error'
    GROUP BY e.event_id, e.user_id
    """,
)
def j13_range_join(spark: SparkSession, sf_dir: str):
    """Interval / as-of style range join.

    Reference: frames between snap and pass_forward (movement_stats.ipynb ·
    cells 25-26; play_eppa_cpu.py:651). Equi key (user_id) + range predicate →
    Spark plans an equi-join with the range as residual, so it still hashes on
    user_id rather than doing a cartesian product.
    """
    ev = t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts_us").alias("err_us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("p_event"), F.col("ts_us").alias("p_us")
    )
    joined = errors.join(
        purchases,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_us") >= F.col("err_us") - F.lit(600_000_000))
        & (F.col("p_us") < F.col("err_us")),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("p_event").alias("purchases_10min_before")
    )


@register(
    "u4_semi_anti",
    "U4,P2,A7,J2",
    """
    SELECT n_name,
           COUNT(CASE WHEN has_order THEN 1 END) AS customers_with_orders,
           COUNT(CASE WHEN NOT has_order THEN 1 END) AS customers_without_orders
    FROM (
        SELECT c_custkey, c_nationkey,
               EXISTS(SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_order
        FROM customer
    ) flags
    JOIN nation ON n_nationkey = c_nationkey
    GROUP BY n_name
    """,
)
def u4_semi_anti(spark: SparkSession, sf_dir: str):
    """Semi + anti join exposure (set intersection / difference by key).

    Reference: plays present in both event sets via isin
    (completion_probability_torch.py:60-62) — semi/anti in disguise
    (SURVEY §2.3 note).
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    with_o = c.join(o, c.c_custkey == o.o_custkey, "left_semi").withColumn(
        "has_order", F.lit(True)
    )
    without_o = c.join(o, c.c_custkey == o.o_custkey, "left_anti").withColumn(
        "has_order", F.lit(False)
    )
    flags = with_o.unionByName(without_o)
    return (
        flags.join(F.broadcast(n), flags.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.when(F.col("has_order"), 1)).alias("customers_with_orders"),
            F.count(F.when(~F.col("has_order"), 1)).alias("customers_without_orders"),
        )
    )


def a7b_approx_sketches(spark: SparkSession, sf_dir: str):
    """Sketch aggregates — the 100 TB path for distinct counts and
    quantiles (SURVEY A7/A10/M8 name approx_count_distinct and
    percentile_approx as the Spark primitives; the exact twins
    a7_distinct_counts / a10_quantiles are the oracle-checkable versions).
    HLL++ and KLL-style sketches keep state O(1) per group and merge
    associatively, so the partial/final split holds at any scale.

    NOT a catalog entry (VERDICT r7 item 8): approx sketch VALUES are
    engine-specific so a driver row could only ever be `no_oracle`; the
    catalog's sketch coverage lives in a7c_sketch_certify (round5.py),
    whose oracle-checked booleans certify the same HLL++/KLL accuracy
    cross-engine. This helper remains the tolerance harness for
    tests/test_operators.py::test_approx_sketches_close_to_exact."""
    li = t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", [0.5, 0.95], 10000).alias("price_q"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.95))").alias("price_q_exact"),
    )
    orders_err = F.abs(F.col("approx_orders") - F.col("exact_orders")) / F.col("exact_orders")
    p50_err = F.abs(F.col("price_q")[0] - F.col("price_q_exact")[0]) / F.col("price_q_exact")[0]
    p95_err = F.abs(F.col("price_q")[1] - F.col("price_q_exact")[1]) / F.col("price_q_exact")[1]
    return agg.select(
        "l_returnflag",
        "approx_orders",
        F.col("price_q")[0].alias("price_p50"),
        F.col("price_q")[1].alias("price_p95"),
        F.round(orders_err, 6).alias("orders_rel_err"),
        (
            (orders_err > 0.05).cast("long")
            + (p50_err > 0.05).cast("long")
            + (p95_err > 0.05).cast("long")
        ).alias("invariant_violations"),
    )


@register(
    "u5_except_intersect",
    "U4,U2,A7",
    """
    WITH a AS (SELECT l_orderkey AS k FROM lineitem),
         b AS (SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'),
         ex AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b),
         ia AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
    SELECT (SELECT COUNT(*) FROM ex) AS n_except_rows,
           (SELECT COUNT(DISTINCT k) FROM ex) AS n_except_keys,
           (SELECT COUNT(*) FROM ia) AS n_intersect_rows
    """,
)
def u5_except_intersect(spark: SparkSession, sf_dir: str):
    """Bag difference / intersection (EXCEPT ALL / INTERSECT ALL) — the set
    operators SURVEY §2.7 notes the reference never needs but the engine
    exposes for completeness. Multiplicity-preserving: a lineitem orderkey
    appearing 4 times minus one matching order row leaves 3 copies.

    Scale: both operators hash-partition on the full row — same shuffle
    class as a groupBy on the key."""
    li = t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    od = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("k"))
    )
    ex = li.exceptAll(od).agg(
        F.count("*").alias("n_except_rows"),
        F.countDistinct("k").alias("n_except_keys"),
    )
    ia = li.intersectAll(od).agg(F.count("*").alias("n_intersect_rows"))
    return ex.crossJoin(ia)


# --------------------------------------------------------------------------
# Windows
# --------------------------------------------------------------------------


@register(
    "w1_lag_gaps",
    "W1,A4,A1,F12",
    """
    WITH gaps AS (
        SELECT user_id,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
        FROM events
    )
    SELECT user_id,
           COUNT(gap_us) AS n_gaps,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
           MAX(gap_us) AS max_gap_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def w1_lag_gaps(spark: SparkSession, sf_dir: str):
    """Grouped lag/diff — the velocity/acceleration pattern.

    Reference: v_x,v_y via groupby(gameId,playId).diff()/0.1 and a_x,a_y via
    per-player diff (normalize.py:67-82). Integer epoch arithmetic → exact.
    """
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = ev.withColumn("gap_us", F.col("ts_us") - F.lag("ts_us").over(w))
    return (
        gaps.filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.sum("gap_us").alias("total_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
    )


@register(
    "w3_rolling_mean",
    "W3,A5",
    """
    SELECT event_id, user_id,
           (CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
            / COUNT(value) OVER w) AS roll_avg_5
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def w3_rolling_mean(spark: SparkSession, sf_dir: str):
    """Grouped rolling mean over ordered frames.

    Reference: 20/10/30/5-frame rolling speed windows
    (movement_stats.ipynb · cells 2,21). Decimal-exact numerator keeps the
    rolling average bit-identical across engines.
    """
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        (F.sum(dec("value")).over(w).cast("double") / F.count("value").over(w)).alias(
            "roll_avg_5"
        ),
    )


@register(
    "w4_topk_per_group",
    "W4,A13,A14,O3",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn AS rank_in_cust
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) ranked
    WHERE rn <= 3
    """,
)
def w4_topk_per_group(spark: SparkSession, sf_dir: str):
    """Top-k per group with deterministic tiebreak.

    Reference: grouped nlargest (movement_stats.ipynb · cell 19,
    eppa_analysis.ipynb · cell 4); top-5 nearest defenders per cell
    (play_eppa_cpu.py:400-418) is the same shape at (F,T) group grain.
    """
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rn").alias("rank_in_cust"))
    )


@register(
    "w5_share_of_total",
    "W5,A3,A6,A9",
    """
    WITH shares AS (
        SELECT event_id, user_id,
               CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE)
                 / CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id) AS DOUBLE)
                 AS share,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id) AS DOUBLE)
                 AS user_total
        FROM events
    )
    SELECT event_id, user_id, share, user_total
    FROM shares WHERE user_total >= 500
    """,
)
def w5_share_of_total(spark: SparkSession, sf_dir: str):
    """Per-group normalization (share of group total) + group filter.

    Reference: p / Σp within play (eppa_analysis_all_plays.ipynb · cell 2;
    play_eppa_cpu.py:318,333,484) and keep-groups-where filter
    (completion_probability_torch.py:104-106).
    """
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    tot = F.sum(dec("value")).over(w).cast("double")
    return (
        ev.select(
            "event_id",
            "user_id",
            (dec("value").cast("double") / tot).alias("share"),
            tot.alias("user_total"),
        ).filter(F.col("user_total") >= 500)
    )


@register(
    "a26_argmax_per_group",
    "A26,W6,O1",
    """
    SELECT user_id, event_id AS best_event_id, value AS best_value
    FROM (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY value DESC, event_id DESC) AS rn
        FROM events
    ) ranked WHERE rn = 1
    """,
)
def a26_argmax_per_group(spark: SparkSession, sf_dir: str):
    """Argmax with index recovery (best hypothetical pass of a surface).

    Reference: unravel_index(argmax) → (f,T) of best pass
    (play_eppa_cpu.py:572-574,621-637). Spark-first: max_by over a struct —
    expressed with row_number for a deterministic tiebreak.
    """
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("best_event_id"),
            F.col("value").alias("best_value"),
        )
    )


@register(
    "o2_global_topn",
    "O1,O2,A2",
    f"""
    SELECT c_custkey, c_name, revenue, rnk
    FROM (
        SELECT c_custkey, c_name, revenue,
               ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey) AS rnk
        FROM (
            SELECT c_custkey, c_name, {dsum('o_totalprice')} AS revenue
            FROM customer JOIN orders ON o_custkey = c_custkey
            GROUP BY c_custkey, c_name
        ) agg
    ) ranked WHERE rnk <= 10
    """,
)
def o2_global_topn(spark: SparkSession, sf_dir: str):
    """Global deterministic top-N ranking table.

    Reference: sort + head(N) ranking tables (movement_stats.ipynb · cell 8;
    eppa_analysis_all_plays.ipynb · cell 10). TakeOrdered at scale — only the
    per-partition top-N is shuffled.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    agg = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(dec_sum("o_totalprice").alias("revenue"))
    )
    # orderBy().limit(k) compiles to TakeOrderedAndProject: each partition
    # keeps its local top-k and only k rows per partition reach the driver —
    # no global single-partition sort, no matter the customer count. The
    # row_number window then ranks only the surviving k rows.
    top = agg.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(10)
    w = Window.orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return top.withColumn("rnk", F.row_number().over(w)).select(
        "c_custkey", "c_name", "revenue", "rnk"
    )


# --------------------------------------------------------------------------
# Aggregation specials
# --------------------------------------------------------------------------


@register(
    "a7_distinct_counts",
    "A7,U2,A24,P14",
    f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {dsum('value')} AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def a7_distinct_counts(spark: SparkSession, sf_dir: str):
    """Count / distinct-count / masked sum per category.

    Reference: distinct counts (movement_stats.ipynb · cell 24;
    historical-L-T.ipynb · cell 11).
    """
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dec_sum("value").alias("total_value"),
    )


@register(
    "a24_masked_pivot",
    "A24,P10,A1",
    f"""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signups
    FROM events
    GROUP BY user_id
    """,
)
def a24_masked_pivot(spark: SparkSession, sf_dir: str):
    """Masked aggregation by category (manual pivot).

    Reference: np.sum(..., where=teams=='OFF') masked team sums
    (play_eppa_cpu.py:386-387) and one-hot flag construction (:55-67).
    """
    ev = t(spark, sf_dir, "events")
    zero = F.lit(0).cast("decimal(18,2)")
    return ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", dec("value")).otherwise(zero))
        .cast("double")
        .alias("purchase_value"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        F.count(F.when(F.col("event_type") == "signup", 1)).alias("n_signups"),
    )


@register(
    "a8_relative_freq",
    "A8,A9",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS rel_freq
    FROM events
    GROUP BY event_type
    """,
)
def a8_relative_freq(spark: SparkSession, sf_dir: str):
    """Relative frequency: groupby.size()/len.

    Reference: PassRelatedProbabilities.ipynb · cell 1 (p(t) empirical
    distribution). Integer counts → double division is exact cross-engine.
    """
    ev = t(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy()
    return counts.select(
        "event_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w)).alias("rel_freq"),
    )


@register(
    "a10_quantiles",
    "A10,A11,M8",
    """
    SELECT l_returnflag,
           round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25), 6) AS q25,
           round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS q50,
           round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.9), 6) AS q90,
           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 6) AS price_median
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a10_quantiles(spark: SparkSession, sf_dir: str):
    """Exact percentiles per group (quantile-lambda UDAF family).

    Reference: percentile lists (historical-L-T.ipynb · cell 3;
    movement_stats.ipynb · cell 5 q_at(y) named aggs). Spark `percentile` is
    exact, matching DuckDB quantile_cont's linear interpolation.
    """
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("q25"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("q50"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("q90"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("price_median"),
    )


@register(
    "a15_event_sets",
    "A15,U2,P2",
    """
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS event_types,
           COUNT(DISTINCT event_type) AS n_types
    FROM events
    WHERE user_id < 30
    GROUP BY user_id
    """,
)
def a15_event_sets(spark: SparkSession, sf_dir: str):
    """Collect-set aggregation rendered deterministically.

    Reference: event list per play (movement_stats.ipynb · cell 24).
    collect_set order is nondeterministic → sort_array + concat_ws makes the
    result stable and oracle-comparable.
    """
    ev = t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("user_id") < 30)
        .groupBy("user_id")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias("event_types"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )


@register(
    "a16_corr_moments",
    "A16,A1",
    """
    WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           round((n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 8) AS corr_qty_price,
           n
    FROM m
    """,
)
def a16_corr_moments(spark: SparkSession, sf_dir: str):
    """Pearson correlation via exact moment sums.

    Reference: EPPA vs realized EPA correlations (eppa_analysis.ipynb ·
    cells 12-18). Moments are decimal-exact; the final formula is one
    identical double expression on both engines → bit-stable, rounded for
    belt-and-braces.
    """
    li = t(spark, sf_dir, "lineitem")
    q, p = dec("l_quantity"), dec("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p * p).cast("double").alias("syy"),
        F.sum(q * p).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    corr = (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
    return m.select("l_returnflag", F.round(corr, 8).alias("corr_qty_price"), "n")


@register(
    "a18_histogram_2d",
    "A18,F19,F6",
    f"""
    SELECT CAST(floor(epoch_us(ts) / 3600000000) % 24 AS BIGINT) AS hour_bin,
           CAST(floor(value / 20) AS BIGINT) AS value_bin,
           COUNT(*) AS n,
           {dsum('value')} AS bin_value
    FROM events
    GROUP BY 1, 2
    """,
)
def a18_histogram_2d(spark: SparkSession, sf_dir: str):
    """2D histogram over fixed bins.

    Reference: 1D/2D histograms for priors (historical-L-T.ipynb · cells
    5,16,20; Calibration Viz.ipynb · cell 5). floor on doubles is IEEE-exact
    in both engines.
    """
    ev = t(spark, sf_dir, "events")
    return ev.groupBy(
        (F.floor(F.col("ts_us") / 3_600_000_000) % 24).cast("long").alias("hour_bin"),
        F.floor(F.col("value") / 20).cast("long").alias("value_bin"),
    ).agg(F.count("*").alias("n"), dec_sum("value").alias("bin_value"))


@register(
    "a19_calibration",
    "A19,A18,F19",
    f"""
    SELECT CAST(round(l_discount * 100, 0) AS BIGINT) AS disc_bin,
           COUNT(*) AS n,
           {davg('l_quantity')} AS mean_qty,
           {davg('l_extendedprice')} AS mean_price
    FROM lineitem
    GROUP BY 1
    """,
)
def a19_calibration(spark: SparkSession, sf_dir: str):
    """Calibration curve: bucketize a prediction-like column, per-bin
    empirical mean of an outcome-like column.

    Reference: Calibration Viz.ipynb · cell 5 (trans_prob bins vs
    true_outcomes mean) — the reference's acceptance test, SURVEY §5.3.
    """
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("disc_bin")
    ).agg(
        F.count("*").alias("n"),
        (F.sum(dec("l_quantity")).cast("double") / F.count("l_quantity")).alias("mean_qty"),
        (F.sum(dec("l_extendedprice")).cast("double") / F.count("l_extendedprice")).alias(
            "mean_price"
        ),
    )


@register(
    "a25_cumulative",
    "A25,W7,A23",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
           round(exp(SUM(ln(1.0 - 1.0/(2.0 + value))) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 8) AS survival
    FROM events
    WHERE user_id < 50
    """,
)
def a25_cumulative(spark: SparkSession, sf_dir: str):
    """Ordered cumulative sum + cumulative product (survival along a
    trajectory).

    Reference: ball-in-play survival cumprod over the flight path
    (play_eppa_cpu.py:373-385; frame_eppa.py:303,318). The cumprod is
    exp∘cumsum∘ln — rounded because libm ln/exp may differ in the last ulp.
    """
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p_term = F.log(F.lit(1.0) - F.lit(1.0) / (F.lit(2.0) + F.col("value")))
    return (
        ev.filter(F.col("user_id") < 50)
        .select(
            "event_id",
            "user_id",
            F.sum(dec("value")).over(w).cast("double").alias("running_value"),
            F.round(F.exp(F.sum(p_term).over(w)), 8).alias("survival"),
        )
    )


@register(
    "j15_asof_join",
    "J15,J13,W1,P3",
    """
    WITH p AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, value AS purchase_value
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, epoch_us(ts) AS c_ts_us, value AS c_value
        FROM events WHERE event_type = 'click'
    )
    SELECT p.user_id, p.ts_us, p.event_id, p.purchase_value,
           c.c_ts_us AS click_ts_us_asof, c.c_value AS click_value_asof
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts_us >= c.c_ts_us
    """,
)
def j15_asof_join(spark: SparkSession, sf_dir: str):
    """As-of join: each purchase enriched with the user's most recent
    prior-or-simultaneous click (timestamp + value; nulls if none).

    Spark side is the union+ordered-window formulation (one shuffle on the
    key, no range-join blowup — operators/asof.py); the oracle is DuckDB's
    native ASOF LEFT JOIN, pinning the standard semantics bit-for-bit.
    Reference analogue: nearest-preceding-event enrichment (SURVEY §2.3
    J13, movement_stats.ipynb · cells 25-26).
    """
    from bigdatabowl_spark.operators.asof import asof_join

    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", "event_id",
        F.col("value").alias("purchase_value"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts_us").alias("c_ts_us"),
        F.col("value").alias("c_value"),
    )
    out = asof_join(
        purchases, clicks,
        key="user_id", left_ts="ts_us", right_ts="c_ts_us",
        payload_cols=["c_ts_us", "c_value"],
    )
    return out.select(
        "user_id", "ts_us", "event_id", "purchase_value",
        F.col("c_ts_us_asof").alias("click_ts_us_asof"),
        F.col("c_value_asof").alias("click_value_asof"),
    )


@register(
    "j16_full_outer",
    "J16,A1,P13",
    """
    WITH c AS (
        SELECT user_id, COUNT(*) AS n_clicks
        FROM events WHERE event_type = 'click' GROUP BY user_id
    ),
    p AS (
        SELECT user_id, COUNT(*) AS n_purchases
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           COALESCE(c.n_clicks, 0) AS n_clicks,
           COALESCE(p.n_purchases, 0) AS n_purchases,
           (c.user_id IS NULL) AS buys_without_clicking,
           (p.user_id IS NULL) AS clicks_without_buying
    FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
    """,
)
def j16_full_outer(spark: SparkSession, sf_dir: str):
    """Full outer join — completes the engine's join-type matrix (inner,
    left, semi, anti, cross, range, as-of, rollup are covered elsewhere).
    Per-user click vs purchase aggregates, keeping users present on only
    one side (COALESCE null-fill, P13).

    Scale: both sides pre-aggregate before the join, so the full-outer
    shuffles key-cardinality rows, not raw events."""
    ev = t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_clicks"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_purchases"))
    )
    c, p = clicks.alias("c"), purchases.alias("p")
    joined = c.join(p, F.col("c.user_id") == F.col("p.user_id"), "full_outer")
    return joined.select(
        F.coalesce(F.col("c.user_id"), F.col("p.user_id")).alias("user_id"),
        F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        F.col("c.user_id").isNull().alias("buys_without_clicking"),
        F.col("p.user_id").isNull().alias("clicks_without_buying"),
    )


@register(
    "resample_interpolate",
    "RS1,W1,J15,A4,F6",
    """
    WITH ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
        FROM events WHERE user_id < 20
    ),
    bounds AS (
        SELECT user_id,
               ((MIN(ts_us) + 3599999999) // 3600000000) * 3600000000 AS g_start,
               (MAX(ts_us) // 3600000000) * 3600000000 AS g_end
        FROM ev GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(g_start, g_end, 3600000000)) AS t_us
        FROM bounds WHERE g_end >= g_start
    ),
    u AS (
        SELECT user_id, ts_us AS t_us, value AS v, 0 AS is_grid,
               ts_us AS ev_ts, event_id AS ord FROM ev
        UNION ALL
        SELECT user_id, t_us, NULL, 1, NULL, -1 FROM grid
    ),
    scanned AS (
        SELECT user_id, t_us, is_grid,
               last_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY t_us, is_grid, ord
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               last_value(ev_ts IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY t_us, is_grid, ord
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
               last_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY t_us DESC, is_grid DESC, ord DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nv,
               last_value(ev_ts IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY t_us DESC, is_grid DESC, ord DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nt
        FROM u
    )
    SELECT user_id, t_us AS grid_us,
           round(CASE WHEN pt IS NULL THEN NULL
                      WHEN nt IS NULL THEN pv
                      ELSE pv + (nv - pv) * (CAST(t_us - pt AS DOUBLE)
                                             / CAST(nt - pt AS DOUBLE))
                 END, 6) AS v_interp,
           nt - pt AS gap_us
    FROM scanned WHERE is_grid = 1
    """,
)
def resample_interpolate(spark: SparkSession, sf_dir: str):
    """Resample an irregular event series onto a regular hourly grid with
    linear interpolation (RS1) — the canonical sensor/tracking-data
    alignment step (the reference's 10 Hz frames are already regular; real
    telemetry is not, and every downstream window op assumes a grid).

    One pass, no join: grid points and events union into a single stream,
    and two ordered window scans (forward = last event at-or-before,
    backward = first event strictly-after) recover both interpolation
    endpoints — the same shuffle shape as the as-of join (J15), one
    exchange on user_id. Tie rules are explicit in the sort key (events
    sort before grid points forward, after them backward; event_id breaks
    same-timestamp ties) so both engines scan identical orders. Endpoint
    grid points hold the last value (nt IS NULL branch); the grid is
    ceil/floor-aligned inside each user's span with integer arithmetic.

    Scale: sequence+explode is map-side; the window pass is one exchange
    on user_id with O(1) running state — the W1/W3 posture. Grid density
    is a multiplier on rows, not on shuffle count.
    """
    from pyspark.sql import Window

    HOUR = 3_600_000_000
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .select("user_id", "event_id", "ts_us", "value")
    )
    bounds = ev.groupBy("user_id").agg(
        F.expr(f"((MIN(ts_us) + {HOUR - 1}) DIV {HOUR}) * {HOUR}").alias("g_start"),
        F.expr(f"(MAX(ts_us) DIV {HOUR}) * {HOUR}").alias("g_end"),
    )
    grid = bounds.filter(F.col("g_end") >= F.col("g_start")).select(
        "user_id",
        F.explode(F.sequence("g_start", "g_end", F.lit(HOUR))).alias("t_us"),
    )
    u = ev.select(
        "user_id",
        F.col("ts_us").alias("t_us"),
        F.col("value").alias("v"),
        F.lit(0).alias("is_grid"),
        F.col("ts_us").alias("ev_ts"),
        F.col("event_id").alias("ord"),
    ).unionByName(
        grid.select(
            "user_id",
            "t_us",
            F.lit(None).cast("double").alias("v"),
            F.lit(1).alias("is_grid"),
            F.lit(None).cast("long").alias("ev_ts"),
            F.lit(-1).cast("long").alias("ord"),
        )
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "is_grid", "ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bwd = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("t_us"), F.desc("is_grid"), F.desc("ord"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scanned = u.select(
        "user_id",
        "t_us",
        "is_grid",
        F.last("v", ignorenulls=True).over(fwd).alias("pv"),
        F.last("ev_ts", ignorenulls=True).over(fwd).alias("pt"),
        F.last("v", ignorenulls=True).over(bwd).alias("nv"),
        F.last("ev_ts", ignorenulls=True).over(bwd).alias("nt"),
    )
    frac = (F.col("t_us") - F.col("pt")).cast("double") / (
        F.col("nt") - F.col("pt")
    ).cast("double")
    interp = (
        F.when(F.col("pt").isNull(), F.lit(None).cast("double"))
        .when(F.col("nt").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return scanned.filter(F.col("is_grid") == 1).select(
        "user_id",
        F.col("t_us").alias("grid_us"),
        F.round(interp, 6).alias("v_interp"),
        (F.col("nt") - F.col("pt")).alias("gap_us"),
    )


@register(
    "o7_global_rank",
    "O7,O1,O4,A9,W4",
    """
    WITH ranked AS (
        SELECT doc_id, n_chars,
               ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rnk,
               COUNT(*) OVER () AS n_total
        FROM documents
    )
    SELECT doc_id, n_chars, rnk,
           round(CAST(rnk - 1 AS DOUBLE) / CAST(n_total - 1 AS DOUBLE), 9)
               AS pct_rank
    FROM ranked
    """,
)
def o7_global_rank(spark: SparkSession, sf_dir: str):
    """Distributed global ranking (O7): every document's exact global rank
    and percentile under a total order, WITHOUT the single-reducer global
    window (`ROW_NUMBER() OVER (ORDER BY ...)` with no PARTITION BY
    collapses to one task in Spark — the anti-pattern).

    The scale pattern (DataFrame zipWithIndex): range-partition on the
    sort key so partition i holds keys entirely below partition i+1, sort
    within partitions, localCheckpoint the partitioned data so both
    consumers read it once, rank locally with an Arrow running counter
    (mapInPandas — order-preserving, NO second shuffle), count rows per
    partition (a |partitions|-row aggregate), and broadcast the
    prefix-sum offsets back. Rank = local rank + offset. The output is
    independent of where the sampled range boundaries fall because the
    (n_chars, doc_id) tiebreak makes the total order unique — so the
    result is deterministic even though RangePartitioner samples its
    bounds.

    Scale: ONE data exchange (the same shuffle a distributed sort pays),
    one tiny aggregate, one broadcast join — versus a full corpus through
    a single reducer. This is how global leaderboards/percentiles ship at
    100 TB.
    """
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    n_parts = max(8, spark.sparkContext.defaultParallelism)
    parted = (
        docs.repartitionByRange(n_parts, "n_chars", "doc_id")
        .sortWithinPartitions("n_chars", "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()  # materialize the range exchange once for both consumers
    )
    counts = parted.groupBy("pid").agg(F.count("*").alias("cnt"))
    w_off = (
        Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = counts.select(
        "pid", (F.sum("cnt").over(w_off) - F.col("cnt")).alias("offset")
    )

    def local_rank(batches):
        # per-partition running counter; mapInPandas preserves the sorted
        # partition order, so the counter IS the local row_number
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["local_rnk"] = range(seen + 1, seen + 1 + len(pdf))
            seen += len(pdf)
            yield pdf

    ranked = parted.mapInPandas(
        local_rank, "doc_id long, n_chars long, pid int, local_rnk long"
    ).join(F.broadcast(offsets), "pid")
    n_total = docs.count()  # scalar (one job); the oracle's COUNT(*) OVER ()
    return ranked.select(
        "doc_id",
        "n_chars",
        (F.col("local_rnk") + F.col("offset")).alias("rnk"),
        F.round(
            (F.col("local_rnk") + F.col("offset") - 1).cast("double")
            / F.lit(float(n_total - 1)),
            9,
        ).alias("pct_rank"),
    )


@register(
    "funnel_steps",
    "FN1,W2,A3,P9,F12",
    """
    WITH s1 AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    w1 AS (
        SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts_us END)
                      OVER (PARTITION BY user_id) AS t_view
        FROM s1
    ),
    w2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts_us > t_view
                           THEN ts_us END)
                      OVER (PARTITION BY user_id) AS t_click
        FROM w1
    ),
    w3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts_us > t_click
                           THEN ts_us END)
                      OVER (PARTITION BY user_id) AS t_purchase
        FROM w2
    )
    SELECT DISTINCT user_id, t_view, t_click, t_purchase,
           CAST(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END
              AS BIGINT) AS stage,
           t_purchase - t_view AS convert_us
    FROM w3
    """,
)
def funnel_steps(spark: SparkSession, sf_dir: str):
    """Ordered-funnel analysis (FN1): per user, the first view, the first
    click strictly AFTER that view, and the first purchase strictly after
    that click — the product-analytics sequence-matching operator (step
    timestamps, funnel stage reached, time-to-convert). Ordering matters:
    a click before the first view does not count, which is what separates
    this from three independent mins.

    The three stages chain as window aggregates over the SAME user
    partitioning — Catalyst plans one exchange on user_id and evaluates
    the dependent windows without re-shuffling (each stage's threshold is
    a per-user scalar from the previous window). NULL ordering semantics
    (ts > NULL → NULL → no match) encode "previous stage not reached"
    identically in both engines.

    Scale: one exchange, O(1) state per window — the W-family posture; a
    longer funnel adds window expressions, not shuffles.
    """
    from pyspark.sql import Window

    w_user = Window.partitionBy("user_id")
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts_us")
    w1 = ev.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w_user),
    )
    w2 = w1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts_us") > F.col("t_view")),
                F.col("ts_us"),
            )
        ).over(w_user),
    )
    w3 = w2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts_us") > F.col("t_click")),
                F.col("ts_us"),
            )
        ).over(w_user),
    )
    stage = (
        F.col("t_view").isNotNull().cast("long")
        + F.col("t_click").isNotNull().cast("long")
        + F.col("t_purchase").isNotNull().cast("long")
    )
    return w3.select(
        "user_id",
        "t_view",
        "t_click",
        "t_purchase",
        stage.alias("stage"),
        (F.col("t_purchase") - F.col("t_view")).alias("convert_us"),
    ).distinct()
