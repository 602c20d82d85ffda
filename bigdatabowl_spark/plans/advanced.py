"""Priors/statistics pipeline + model-scoring queries (SURVEY §2.4 A20-A28,
§2.10 M1/M2, §2.1 S3, §2.2 P5/P13, §2.3 J10).

The reference's Phase-2 priors pipeline (historical-L-T.ipynb) fits gamma
distributions to throw-time/distance histograms and smooths them; its value
models (M1/M2) are tree ensembles scored per row. Re-expressed Spark-first:
moment computations are decimal-exact groupBy aggregates, smoothing is a
window over bin index, and tree scoring is a generated CASE expression —
all JVM-side, all with bit-exact DuckDB oracles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession, Window

from bigdatabowl_spark.functions.scalar import dec, dec_sum
from bigdatabowl_spark.plans.catalog import register, t, dsum

# --------------------------------------------------------------------------


@register(
    "a20_gamma_moments_fit",
    "A20,A1",
    """
    WITH m AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sxx
        FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           round(sx / n, 8) AS mean_value,
           round((sxx - sx*sx/n) / (n - 1), 8) AS var_value,
           round((sx/n)*(sx/n) / ((sxx - sx*sx/n) / (n - 1)), 8) AS gamma_shape,
           round(((sxx - sx*sx/n) / (n - 1)) / (sx/n), 8) AS gamma_scale
    FROM m
    """,
)
def a20_gamma_moments_fit(spark: SparkSession, sf_dir: str):
    """Gamma distribution fit per group (method of moments) — the
    oracle-exact twin of the MLE path.

    Reference: gamma MLE per group for p(t), P(T|L) priors
    (historical-L-T.ipynb · cells 5,12,25). Moments are decimal-exact →
    formulas bit-stable, so this flavor carries the cross-engine hash
    oracle; the reference-faithful estimator (scipy ≡ digamma-Newton MLE)
    is the a20b_gamma_mle_fit catalog entry, which self-certifies against
    this fit by the MLE optimality property.
    """
    ev = t(spark, sf_dir, "events")
    v = dec("value")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).cast("double").alias("sx"),
        F.sum(v * v).cast("double").alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    mean = sx / n
    var = (sxx - sx * sx / n) / (n - 1)
    return m.select(
        "event_type",
        "n",
        F.round(mean, 8).alias("mean_value"),
        F.round(var, 8).alias("var_value"),
        F.round(mean * mean / var, 8).alias("gamma_shape"),
        F.round(var / mean, 8).alias("gamma_scale"),
    )


@register(
    "a20b_gamma_mle_fit",
    "A20,A21,M8",
    None,  # Newton-on-digamma is not SQL-expressible — rows-only; the query
    # SELF-CERTIFIES instead: by definition the MLE attains at least the
    # moment fit's log-likelihood on the same sample, and that comparison is
    # emitted as invariant_violations (must be 0 in every row).
)
def a20b_gamma_mle_fit(spark: SparkSession, sf_dir: str):
    """Per-group gamma MLE — the reference's actual estimator
    (scipy.stats.gamma.fit(floc=0) ≡ Newton on the digamma likelihood
    equation; historical-L-T.ipynb · cells 5,12). Runs kernels/priors.py's
    deterministic pure-NumPy MLE inside applyInPandas (one group per Arrow
    batch) and emits BOTH estimators plus their log-likelihoods, so the
    rows-only driver check exercises the estimator's defining property:
    loglik_mle ≥ loglik_mom.

    Scale: one shuffle on the group key; the fit is O(n log-iterations) per
    group. In the real priors pipeline the group axis is the 60 distance
    bins × adaptive windows (thousands of groups at 100 TB) — parallelism
    comes from groups, and each group's sample fits one Arrow batch.
    """
    import numpy as np
    import pandas as pd
    from math import lgamma

    from bigdatabowl_spark.kernels.priors import gamma_mle

    ev = t(spark, sf_dir, "events").select("event_type", "value")
    schema = (
        "event_type string, n long, shape_mle double, scale_mle double, "
        "shape_mom double, scale_mom double, loglik_mle double, "
        "loglik_mom double, invariant_violations long"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["value"].to_numpy(dtype=np.float64)
        x = x[x > 0]
        k_mle, th_mle = gamma_mle(x)
        mean = x.mean()
        var = x.var(ddof=1)
        k_mom, th_mom = mean * mean / var, var / mean
        ln_sum = float(np.log(x).sum())

        def loglik(k: float, th: float) -> float:
            return (
                (k - 1.0) * ln_sum
                - float(x.sum()) / th
                - len(x) * (k * np.log(th) + lgamma(k))
            )

        ll_mle, ll_mom = loglik(k_mle, th_mle), loglik(k_mom, th_mom)
        viol = int(not (ll_mle >= ll_mom - 1e-6 * abs(ll_mom)))
        return pd.DataFrame(
            [
                {
                    "event_type": str(pdf["event_type"].iloc[0]),
                    "n": len(x),
                    "shape_mle": float(k_mle),
                    "scale_mle": float(th_mle),
                    "shape_mom": float(k_mom),
                    "scale_mom": float(th_mom),
                    "loglik_mle": float(ll_mle),
                    "loglik_mom": float(ll_mom),
                    "invariant_violations": viol,
                }
            ]
        )

    from bigdatabowl_spark.plans.eppa_queries import materialize_kernel

    return materialize_kernel(
        ev.groupBy("event_type").applyInPandas(fit, schema), "a20b_gamma_mle_fit", sf_dir
    )


@register(
    "a21_adaptive_window_fit",
    "A21,J13,A1",
    """
    WITH binned AS (
        SELECT CAST(floor(value / 10) AS BIGINT) AS d, value FROM events
    ),
    bins AS (SELECT DISTINCT d FROM binned)
    SELECT bins.d AS d,
           COUNT(*) AS n_window,
           CAST(SUM(CAST(b.value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS window_mean
    FROM bins JOIN binned b ON b.d BETWEEN bins.d - 1 AND bins.d + 1
    GROUP BY bins.d
    """,
)
def a21_adaptive_window_fit(spark: SparkSession, sf_dir: str):
    """Windowed-neighborhood grouping: fit over distance bin d±1.

    Reference: gamma fit over distance window d±5 with adaptive widening
    (historical-L-T.ipynb · cells 12,20). The range self-join (bin dim ⋈
    fact on BETWEEN) is the Spark-native form; the bin dim is tiny →
    broadcast, so the fact table is scanned once.
    """
    ev = t(spark, sf_dir, "events")
    binned = ev.select(F.floor(F.col("value") / 10).cast("long").alias("d"), "value")
    bins = binned.select("d").distinct().withColumnRenamed("d", "d0")
    joined = F.broadcast(bins).join(
        binned, (F.col("d") >= F.col("d0") - 1) & (F.col("d") <= F.col("d0") + 1)
    )
    return joined.groupBy(F.col("d0").alias("d")).agg(
        F.count("*").alias("n_window"),
        (F.sum(dec("value")).cast("double") / F.count("*")).alias("window_mean"),
    )


@register(
    "a22_histogram_smooth",
    "A22,F18,A18,W3",
    """
    WITH hist AS (
        SELECT CAST(floor(value / 10) AS BIGINT) AS bin, COUNT(*) AS n
        FROM events GROUP BY 1
    )
    SELECT bin, n,
           COALESCE(LAG(n) OVER (ORDER BY bin), 0)
             + 2*n
             + COALESCE(LEAD(n) OVER (ORDER BY bin), 0) AS smooth_x4
    FROM hist
    """,
)
def a22_histogram_smooth(spark: SparkSession, sf_dir: str):
    """Kernel smoothing of a histogram ([1,2,1] convolution over bin index).

    Reference: Gaussian smoothing of the 2D L-histogram (σ=5,
    historical-L-T.ipynb · cell 16) and np.convolve moving-average
    (PassRelatedProbabilities.ipynb · cell 3). Integer weights → exact.
    """
    ev = t(spark, sf_dir, "events")
    hist = ev.groupBy(F.floor(F.col("value") / 10).cast("long").alias("bin")).agg(
        F.count("*").alias("n")
    )
    w = Window.orderBy("bin")
    smooth = (
        F.coalesce(F.lag("n").over(w), F.lit(0))
        + 2 * F.col("n")
        + F.coalesce(F.lead("n").over(w), F.lit(0))
    )
    return hist.select("bin", "n", smooth.alias("smooth_x4"))


@register(
    "a23_group_product",
    "A23,F4",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           round(exp(SUM(ln(1.0 + value / 1000.0))), 6) AS growth_product,
           round(1.0 - exp(SUM(ln(1.0 - 1.0 / (10.0 + value)))), 6) AS p_any
    FROM events
    GROUP BY user_id
    """,
)
def a23_group_product(spark: SparkSession, sf_dir: str):
    """Masked team-product 1−∏(1−p) over group members.

    Reference: play_eppa_cpu.py:270-271 / frame_eppa.py:205-207 (probability
    any defender intercepts). exp∘Σ∘ln keeps it associative-safe for
    distributed partial aggregation; rounded for libm parity.
    """
    ev = t(spark, sf_dir, "events")
    v = F.col("value")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.exp(F.sum(F.log(F.lit(1.0) + v / 1000.0))), 6).alias("growth_product"),
        F.round(
            F.lit(1.0) - F.exp(F.sum(F.log(F.lit(1.0) - F.lit(1.0) / (F.lit(10.0) + v)))), 6
        ).alias("p_any"),
    )


@register(
    "a28_weighted_expectation",
    "A28,J10,F11",
    """
    WITH valued AS (
        SELECT user_id,
               CAST(value AS DECIMAL(18,2)) AS v,
               CASE event_type WHEN 'purchase' THEN 7 WHEN 'signup' THEN 3
                               WHEN 'click' THEN 1 WHEN 'error' THEN -2
                               ELSE 0 END AS class_val
        FROM events
    )
    SELECT user_id,
           CAST(SUM(v * class_val) AS DOUBLE) / CAST(SUM(v) AS DOUBLE) AS expected_class_value,
           CAST(SUM(v) AS DOUBLE) AS total_weight
    FROM valued
    GROUP BY user_id
    """,
)
def a28_weighted_expectation(spark: SparkSession, sf_dir: str):
    """Weighted expectation over class values Σ p·v / Σ p.

    Reference: EP expectation Σ ypred·epvals (play_eppa_cpu.py:149,458 with
    epvals=[7,-7,3,-3,2,-2,0]). decimal·int sums are exact; one double
    division at the end.
    """
    ev = t(spark, sf_dir, "events")
    class_val = (
        F.when(F.col("event_type") == "purchase", 7)
        .when(F.col("event_type") == "signup", 3)
        .when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", -2)
        .otherwise(0)
    )
    valued = ev.select("user_id", dec("value").alias("v"), class_val.alias("class_val"))
    return valued.groupBy("user_id").agg(
        (F.sum(F.col("v") * F.col("class_val")).cast("double") / F.sum("v").cast("double")).alias(
            "expected_class_value"
        ),
        F.sum("v").cast("double").alias("total_weight"),
    )


@register(
    "j10_prior_weighted_rank",
    "J10,A9,A2,A8",
    """
    WITH prior AS (
        SELECT event_type, COUNT(*) AS n_type FROM events GROUP BY event_type
    ),
    scored AS (
        SELECT e.user_id,
               CAST(SUM(CAST(e.value AS DECIMAL(18,2)) * p.n_type) AS DOUBLE) AS weighted_sum
        FROM events e JOIN prior p ON e.event_type = p.event_type
        GROUP BY e.user_id
    ),
    total AS (SELECT COUNT(*) AS big_n FROM events)
    SELECT user_id,
           weighted_sum / big_n AS prior_weighted_score
    FROM scored, total
    ORDER BY prior_weighted_score DESC
    """,
)
def j10_prior_weighted_rank(spark: SparkSession, sf_dir: str):
    """Prior-table join on a non-key attribute + weighted ranking.

    Reference: p_t prior joined on frames_after_snap, then p(t)-weighted
    player aggregation (eppa_analysis_all_plays.ipynb · cell 2). The prior is
    a tiny aggregate → broadcast back onto the fact.
    """
    ev = t(spark, sf_dir, "events")
    prior = ev.groupBy("event_type").agg(F.count("*").alias("n_type"))
    big_n = ev.count()  # scalar prior normalizer (driver-side, one job)
    scored = (
        ev.join(F.broadcast(prior), "event_type")
        .groupBy("user_id")
        .agg(F.sum(dec("value") * F.col("n_type")).cast("double").alias("weighted_sum"))
    )
    return scored.select(
        "user_id", (F.col("weighted_sum") / F.lit(big_n)).alias("prior_weighted_score")
    )


# --------------------------------------------------------------------------
# Model scoring (M1/M2) — tree-ensemble inference as relational CASE logic
# --------------------------------------------------------------------------

# 8-class softprob ensemble at the reference's inference width: a 26-feature
# vector, 2 depth-2 trees per class (16 trees), softmax over class margins,
# and the expectation over the class value vector — the exact shape of the
# reference's EP scoring (26-col frame → xgboost softprob(8) → ·epvals,
# play_eppa_cpu.py:424,456-459, epvals :136-149). The generated CASE cascade
# is plain SQL shared VERBATIM between the Spark plan (F.expr → Catalyst →
# WholeStageCodegen) and the DuckDB oracle, so margins are bit-identical by
# construction; only exp() can differ in the last ulp, absorbed by round(6).

_EPVALS = (7.0, -7.0, 3.0, -3.0, 2.0, -2.0, 0.0, 1.0)  # 8-class value vector
_N_CLASSES = len(_EPVALS)

# integer cents → exact modulo features on both engines
_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"
_MOD_PRIMES = (211, 197, 181, 173, 167, 163, 157, 151, 149, 139, 137, 131, 127, 113, 109, 107, 103, 101)

# (expr, threshold) × 26 — the feature vector. All exprs are valid in both
# Spark SQL and DuckDB.
_FEATURES: list[tuple[str, float]] = [
    ("o_totalprice", 150000.0),
    ("CAST(year(o_orderdate) AS DOUBLE)", 1995.5),
    ("CAST(month(o_orderdate) AS DOUBLE)", 6.5),
    ("CAST(quarter(o_orderdate) AS DOUBLE)", 2.5),
    ("CAST(day(o_orderdate) AS DOUBLE)", 15.5),
    ("CAST(o_custkey % 5 AS DOUBLE)", 2.5),
    ("CAST(ascii(o_orderstatus) AS DOUBLE)", 75.0),
    ("CAST(length(o_orderpriority) AS DOUBLE)", 7.5),
] + [(f"CAST({_CENTS} % {p} AS DOUBLE)", p / 2.0) for p in _MOD_PRIMES]
assert len(_FEATURES) == 26


# The ensemble spec is data, not code: one row per depth-2 tree holding
# feature *indices* into _FEATURES plus thresholds and leaf weights (in
# [-0.5, 0.5] so margins stay in [-1, 1] and exp() is well-conditioned).
# m1's builder round-trips these rows through a parquet model artifact (the
# S6 lifecycle, mirroring the reference's version-pinned model binaries at
# play_eppa_cpu.py:80-87) and regenerates the SQL from the *loaded* rows.
_SPEC_ROWS: list[dict] = [
    {
        "tree_id": 2 * c + j,
        "cls": c,
        "fa_idx": (2 * c + j) % 26,
        "thr_a": _FEATURES[(2 * c + j) % 26][1],
        "fb_idx": (2 * c + j + 7) % 26,
        "thr_b": _FEATURES[(2 * c + j + 7) % 26][1],
        "leaves": [((c * 31 + j * 17 + k * 7) % 11 - 5) / 10.0 for k in range(4)],
    }
    for c in range(_N_CLASSES)
    for j in range(2)
]


def _tree_sql_from(row: dict) -> str:
    fa = _FEATURES[row["fa_idx"]][0]
    fb = _FEATURES[row["fb_idx"]][0]
    ta, tb = row["thr_a"], row["thr_b"]
    l0, l1, l2, l3 = (f"CAST({v} AS DOUBLE)" for v in row["leaves"])
    return (
        f"CASE WHEN {fa} < {ta} THEN (CASE WHEN {fb} < {tb} THEN {l0} ELSE {l1} END) "
        f"ELSE (CASE WHEN {fb} < {tb} THEN {l2} ELSE {l3} END) END"
    )


def _margins_from(rows: list[dict]) -> list[str]:
    """Per-class margin SQL from spec rows (order by tree_id within class —
    deterministic regardless of artifact read order)."""
    per_class: dict[int, list[str]] = {}
    for r in sorted(rows, key=lambda r: r["tree_id"]):
        per_class.setdefault(r["cls"], []).append(_tree_sql_from(r))
    return [f"({' + '.join(per_class[c])})" for c in range(_N_CLASSES)]


_MARGINS = _margins_from(_SPEC_ROWS)

# Loaded-spec cache: the reference loads its model binaries once at process
# start (play_eppa_cpu.py:80-87), not per query — the first m1 build does the
# full save→reload lifecycle, repeat builds reuse the loaded spec.
_SPEC_LOADED: list[dict] | None = None
_M_COLS = ", ".join(f"{m} AS m{c}" for c, m in enumerate(_MARGINS))
_Z = " + ".join(f"exp(m{c})" for c in range(_N_CLASSES))
_BEST = "CASE " + " ".join(
    f"WHEN m{c} = g THEN {c}" for c in range(_N_CLASSES)
) + " END"
_XEP_NUM = " + ".join(f"exp(m{c}) * CAST({v} AS DOUBLE)" for c, v in enumerate(_EPVALS))
_M_LIST = ", ".join(f"m{c}" for c in range(_N_CLASSES))


@register(
    "m1_tree_ensemble_score",
    "M1,M2,S4,S6,P10,F4",
    f"""
    WITH feats AS (
        SELECT o_orderkey, {_M_COLS} FROM orders
    ),
    scored AS (
        SELECT o_orderkey, {_M_LIST},
               greatest({_M_LIST}) AS g, ({_Z}) AS z
        FROM feats
    )
    SELECT o_orderkey,
           {_BEST} AS best_class,
           round(exp(g) / z, 6) AS p_best,
           round(({_XEP_NUM}) / z, 6) AS xep
    FROM scored
    """,
)
def m1_tree_ensemble_score(spark: SparkSession, sf_dir: str):
    """8-class tree-ensemble batch inference + value expectation.

    Reference: treelite-compiled XGBoost softprob models scored on 264k-row
    26-feature frames, then dotted with the class value vector
    (play_eppa_cpu.py:424,456-459; epvals :136-149). In production a real
    xgboost artifact would score via `predict_batch_udf` (Arrow-batched);
    here the whole ensemble — 16 depth-2 trees, softmax, expectation — is
    generated relational logic running inside WholeStageCodegen, the fast
    path for small ensembles (no Python round-trip, vectorized JVM).

    The model-binary lifecycle (S6) is real: the spec is persisted as a
    parquet artifact and the CASE cascade is regenerated from the *reloaded*
    rows. parquet round-trips float64 bit-exactly and floats format via
    repr, so the regenerated SQL is string-identical to the static oracle —
    asserted here, so any artifact drift fails loudly instead of silently
    diverging from the oracle.
    """
    from bigdatabowl_spark.sources.artifacts import roundtrip_relational_spec

    global _SPEC_LOADED
    if _SPEC_LOADED is None:
        _SPEC_LOADED = roundtrip_relational_spec(spark, _SPEC_ROWS)
    margins = _margins_from(_SPEC_LOADED)
    assert margins == _MARGINS, "ensemble artifact drifted from compiled spec"

    o = t(spark, sf_dir, "orders")
    feats = o.select(
        "o_orderkey", *[F.expr(m).alias(f"m{c}") for c, m in enumerate(margins)]
    )
    scored = feats.select(
        "o_orderkey",
        *[f"m{c}" for c in range(_N_CLASSES)],
        F.expr(f"greatest({_M_LIST})").alias("g"),
        F.expr(_Z).alias("z"),
    )
    return scored.select(
        "o_orderkey",
        F.expr(_BEST).alias("best_class"),
        F.expr("round(exp(g) / z, 6)").alias("p_best"),
        F.expr(f"round(({_XEP_NUM}) / z, 6)").alias("xep"),
    )


# --------------------------------------------------------------------------
# Scans / unions / null handling
# --------------------------------------------------------------------------


@register(
    "s3_multi_scan_union",
    "S3,U1,P6",
    f"""
    WITH tx AS (
        SELECT 'order' AS kind, o_orderkey AS key, o_totalprice AS amount FROM orders
        UNION ALL
        SELECT 'line' AS kind, l_orderkey AS key, l_extendedprice AS amount FROM lineitem
    )
    SELECT kind, COUNT(*) AS n, {dsum('amount')} AS total_amount,
           COUNT(DISTINCT key) AS n_keys
    FROM tx GROUP BY kind
    """,
)
def s3_multi_scan_union(spark: SparkSession, sf_dir: str):
    """Multi-source union scan into one homogeneous table.

    Reference: weeks 1-17 multi-file union (completion_probability_torch.py:
    29-34); per-play result union (play_eppa_cpu.py:654-657). unionByName on
    aligned projections — Spark unions partitions without a shuffle.
    """
    o = t(spark, sf_dir, "orders").select(
        F.lit("order").alias("kind"),
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("amount"),
    )
    li = t(spark, sf_dir, "lineitem").select(
        F.lit("line").alias("kind"),
        F.col("l_orderkey").alias("key"),
        F.col("l_extendedprice").alias("amount"),
    )
    return o.unionByName(li).groupBy("kind").agg(
        F.count("*").alias("n"),
        dec_sum("amount").alias("total_amount"),
        F.countDistinct("key").alias("n_keys"),
    )


@register(
    "p5_null_handling",
    "P5,P13,P7,F6",
    """
    WITH with_nulls AS (
        SELECT l_orderkey, l_linenumber,
               NULLIF(l_discount, 0.0) AS disc_or_null,
               CASE WHEN l_tax > 0.05 THEN l_tax END AS high_tax
        FROM lineitem
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(disc_or_null) AS n_discounted,
           CAST(SUM(CASE WHEN disc_or_null IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_disc,
           CAST(SUM(CAST(COALESCE(disc_or_null, -1.0) AS DECIMAL(18,2))) AS DOUBLE) AS filled_sum,
           COUNT(high_tax) AS n_high_tax
    FROM with_nulls
    """,
)
def p5_null_handling(spark: SparkSession, sf_dir: str):
    """Null predicates, null-generation, and constant fill.

    Reference: penaltyCodes.isnull filter (eppa_analysis.ipynb · cell 11),
    fillna (normalize.py:20,68-70; visualize.py:342).
    """
    li = t(spark, sf_dir, "lineitem")
    with_nulls = li.select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc_or_null"),
        F.when(F.col("l_tax") > 0.05, F.col("l_tax")).alias("high_tax"),
    )
    return with_nulls.agg(
        F.count("*").alias("n_rows"),
        F.count("disc_or_null").alias("n_discounted"),
        F.sum(F.when(F.col("disc_or_null").isNull(), 1).otherwise(0)).cast("long").alias("n_zero_disc"),
        F.sum(dec(F.coalesce(F.col("disc_or_null"), F.lit(-1.0)))).cast("double").alias("filled_sum"),
        F.count("high_tax").alias("n_high_tax"),
    )


@register(
    "w2_first_event_offset",
    "W2,A3,A4",
    """
    SELECT event_id, user_id, event_type,
           epoch_us(ts) - MIN(epoch_us(ts)) OVER (PARTITION BY user_id, event_type)
             AS us_since_first_of_type
    FROM events
    """,
)
def w2_first_event_offset(spark: SparkSession, sf_dir: str):
    """First-event-per-group broadcast: transform('min') of the frame axis.

    Reference: first event frame per (play, event) via groupby transform
    (completion_probability_torch.py:65). Integer epoch arithmetic — exact.
    """
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        (F.col("ts_us") - F.min("ts_us").over(w)).alias("us_since_first_of_type"),
    )


@register(
    "o5_deterministic_shuffle",
    "O5,O1,F10",
    """
    SELECT o_orderkey, shuffle_key
    FROM (
        SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR) || '_seed42') AS shuffle_key
        FROM orders
    ) keyed
    ORDER BY shuffle_key
    LIMIT 20
    """,
)
def o5_deterministic_shuffle(spark: SparkSession, sf_dir: str):
    """Seeded deterministic shuffle/sample: order by keyed hash, take N.

    Reference: DataLoader shuffle / df.sample (completion_probability_torch.
    py:518; eppa_np_anal.ipynb · cell 16). rand(seed) is not reproducible
    across engines, so the engine exposes hash-ordered sampling — same
    top-N on any cluster size, any partitioning.
    """
    o = t(spark, sf_dir, "orders")
    keyed = o.select(
        "o_orderkey",
        F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit("_seed42"))).alias(
            "shuffle_key"
        ),
    )
    return keyed.orderBy("shuffle_key").limit(20)
