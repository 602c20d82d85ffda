"""Round-6 queries: the M4 transition-prior surface as an oracle relation.

VERDICT r5 item 2: the historical (F,T) transition prior
(play_eppa_cpu.py:301-334) was certified only indirectly — inside the EPPA
kernel (kernels/eppa.py:303-316) and by unit tests. `m4_prior_surface`
exposes the full mask → scale → renormalize chain as an exploded
(flat, T, hq, p_ppm) relation whose DuckDB twin recomputes it from the SAME
staged prior parquet, closing the last unit-test-only reference component
with a direct cross-engine hash.

Cross-engine determinism: both engines read identical float64 prior bytes;
the per-cell product `P(T|L) · p(t)` is one IEEE multiply, the quantization
`floor(h·1e12)` one multiply + floor — bit-identical (1e12 units keep
`hq·1e6` ≥ 1000× inside BIGINT even if a future prior concentrates all
mass on one cell — at 1e15 a single-cell mass above ~0.0092 would
overflow divergently: DuckDB errors, Spark wraps). The renormalization
is integer: parts-per-million via BIGINT floor division against the exact
integer total, so the order-sensitive double sum never crosses engines.
`floor(L + 0.5)` stands in for the kernel's np.rint: with the ball at a
cell center the cell offsets are integers, L = sqrt(integer) is never an
exact .5 tie, so half-to-even and half-up agree everywhere.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatabowl_spark.plans.catalog import register, t
from bigdatabowl_spark.plans.eppa_queries import KERNEL_OUT, _SF_MARKER, marker_value

# Fixed surface configuration: ball at a cell center (integer offsets →
# no rounding ties), throw frame 15 of the p(t) table — mid-dropback, the
# regime the reference plots (historical-L-T.ipynb · cell 7).
_BALL_X = 30.5
_BALL_Y = 26.5
_FRAME_TO_PASS = 15

_PRIOR_STAGE = os.path.join(KERNEL_OUT, "m4_priors")


def _stage_priors(spark: SparkSession, sf_dir: str) -> str:
    """Write the fitted prior tables under KERNEL_OUT so the DuckDB twin
    reads byte-identical float64 (the S11 artifact pattern; priors are
    sf-independent but the marker keeps harness staging semantics)."""
    from bigdatabowl_spark.kernels.priors import (
        T_given_L_prior,
        p_t_prior,
        priors_to_tables,
    )

    marker = os.path.join(_PRIOR_STAGE, _SF_MARKER)
    try:
        with open(marker) as f:
            if f.read().strip() == marker_value(sf_dir):
                return _PRIOR_STAGE
    except OSError:
        pass
    p_t_df, t_l_df = priors_to_tables(spark, p_t_prior(), T_given_L_prior())
    p_t_df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(_PRIOR_STAGE, "p_t")
    )
    t_l_df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(_PRIOR_STAGE, "T_given_L")
    )
    with open(marker, "w") as f:
        f.write(marker_value(sf_dir))
    return _PRIOR_STAGE


@register(
    "m4_prior_surface",
    "M4,F13,F14,J9,A6,W5",
    f"""
    WITH grid AS (
        SELECT CAST(y * 120 + x AS BIGINT) AS flat,
               sqrt((0.5 + CAST(x AS DOUBLE) - {_BALL_X}) * (0.5 + CAST(x AS DOUBLE) - {_BALL_X})
                    + (0.5 + CAST(y AS DOUBLE) - {_BALL_Y}) * (0.5 + CAST(y AS DOUBLE) - {_BALL_Y})) AS L
        FROM (SELECT unnest(generate_series(0, 119)) AS x)
        CROSS JOIN (SELECT unnest(generate_series(0, 54)) AS y)
    ), binned AS (
        SELECT flat,
               CAST(LEAST(GREATEST(floor(L + 0.5), 1), 60) AS INT) AS dist,
               (L > 1.0 AND L <= 60.0) AS in_range
        FROM grid
    ), h AS (
        SELECT b.flat, CAST(tl.T AS BIGINT) AS T,
               CAST(floor(CASE WHEN b.in_range THEN tl.p * pt.p ELSE 0.0 END * 1e12)
                    AS BIGINT) AS hq
        FROM binned b
        JOIN read_parquet('{_PRIOR_STAGE}/T_given_L/*.parquet') tl ON tl.dist = b.dist
        CROSS JOIN (SELECT p FROM read_parquet('{_PRIOR_STAGE}/p_t/*.parquet')
                    WHERE frame_to_pass = {_FRAME_TO_PASS}) pt
    )
    SELECT flat, T, hq,
           hq * 1000000 // CAST(SUM(hq) OVER () AS BIGINT) AS p_ppm
    FROM h
    """,
)
def m4_prior_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical transition-prior surface (M4, play_eppa_cpu.py:301-334):
    per hypothetical pass (cell, time-of-flight), the renormalized prior
    P(T|L(cell)) · p(t) masked to throwable range (1 < L <= 60), exploded
    to (flat, T) rows with parts-per-million integer mass.

    Spark-first shape: the 6,600-cell grid is sequence+explode, the 2,400-row
    P(T|L) table and the single p(t) row are broadcast joins, and the exact
    integer total rides a 1-row broadcast crossJoin. The only shuffle in the
    plan is the SinglePartition exchange feeding the 1-row total aggregate —
    constant-size at any scale (gated in test_plan_quality.py). This is the
    kernel's per-frame np.take gather (kernels/eppa.py:303-316) re-expressed
    relationally."""
    stage = _stage_priors(spark, sf_dir)
    xs = spark.range(1).select(F.explode(F.sequence(F.lit(0), F.lit(119))).alias("x"))
    ys = spark.range(1).select(F.explode(F.sequence(F.lit(0), F.lit(54))).alias("y"))
    L = F.sqrt(
        (0.5 + F.col("x").cast("double") - _BALL_X)
        * (0.5 + F.col("x").cast("double") - _BALL_X)
        + (0.5 + F.col("y").cast("double") - _BALL_Y)
        * (0.5 + F.col("y").cast("double") - _BALL_Y)
    )
    grid = xs.crossJoin(F.broadcast(ys)).select(
        (F.col("y") * 120 + F.col("x")).cast("bigint").alias("flat"), L.alias("L")
    )
    binned = grid.select(
        "flat",
        F.least(F.greatest(F.floor(F.col("L") + 0.5), F.lit(1)), F.lit(60))
        .cast("int")
        .alias("dist"),
        ((F.col("L") > 1.0) & (F.col("L") <= 60.0)).alias("in_range"),
    )
    t_l = spark.read.parquet(os.path.join(stage, "T_given_L")).select(
        "dist", F.col("T").cast("bigint").alias("T"), F.col("p").alias("tl_p")
    )
    p_t = (
        spark.read.parquet(os.path.join(stage, "p_t"))
        .filter(F.col("frame_to_pass") == _FRAME_TO_PASS)
        .select(F.col("p").alias("pt_p"))
    )
    h = (
        binned.join(F.broadcast(t_l), "dist")
        .crossJoin(F.broadcast(p_t))
        .select(
            "flat",
            "T",
            F.floor(
                F.when(F.col("in_range"), F.col("tl_p") * F.col("pt_p"))
                .otherwise(F.lit(0.0))
                * 1e12
            )
            .cast("bigint")
            .alias("hq"),
        )
    )
    total = h.agg(F.sum("hq").cast("bigint").alias("total"))
    return h.crossJoin(F.broadcast(total)).select(
        "flat",
        "T",
        "hq",
        F.expr("hq * 1000000 div total").alias("p_ppm"),
    )


# --------------------------------------------------------------------------
# M1/M2 at arbitrary depth — join-based forest inference, oracle-checked
# --------------------------------------------------------------------------
# m1_tree_ensemble_score compiles a depth-2 spec into a CASE cascade; that
# works only because the depth is a compile-time constant. A real trained
# model (the reference's value models are default-depth xgboost — Rishav's
# xyac.ipynb · cells 5-11, loaded play_eppa_cpu.py:80-87) needs inference
# that treats the MODEL AS DATA: the node relation is staged as parquet and
# traversal is depth-many broadcast joins against it. Both engines read the
# same staged node bytes, so comparisons and the floor-quantized leaf
# margins are bit-identical; margins accumulate as exact integers
# (nano-units), never an order-sensitive double sum.

_FOREST_STAGE = os.path.join(KERNEL_OUT, "m1b_forest")
_FOREST_DEPTH = 4


def scaled_forest(depth: int = _FOREST_DEPTH):
    """default_deep re-thresholded to THIS catalog's feature scales.

    default_deep's thresholds sit in [-0.75, 0.75] (standardized tracking
    features); round6's _FEATURES are raw orders columns (totalprice ~1e5,
    year ~1995, cents % p in 0..p), so the stock thresholds would route
    almost every row down one spine and the four-path certification would
    never exercise most comparisons (round-6 review finding). Each
    internal node's threshold becomes the feature's natural mid-range
    value (_FEATURES[i][1], the same anchors m1's relational spec uses)
    scaled by a deterministic factor in [0.96, 1.04] — tight enough that
    every feature family still splits, varied enough that trees differ."""
    from bigdatabowl_spark.kernels.ensemble import FlatForest
    from bigdatabowl_spark.plans.advanced import _FEATURES

    base = FlatForest.default_deep(depth=depth)
    trees = []
    for t in range(base.n_trees):
        nodes = base.tree_nodes(t)
        lc = nodes["left_children"]
        sc = list(nodes["split_conditions"])
        for i in range(len(lc)):
            if lc[i] != -1:
                feat = nodes["split_indices"][i]
                factor = 0.96 + 0.008 * ((t * 13 + i * 7) % 11)
                sc[i] = _FEATURES[feat][1] * factor
        nodes["split_conditions"] = sc
        trees.append(nodes)
    return FlatForest.from_node_arrays(
        trees, [int(c) for c in base.tree_class], base.epvals.copy()
    )


def _stage_forest(spark: SparkSession, sf_dir: str) -> str:
    """Stage the depth-4 forest node relations under KERNEL_OUT (S6/S11;
    the model artifact both engines traverse)."""
    from bigdatabowl_spark.sources.artifacts import save_forest

    marker = os.path.join(_FOREST_STAGE, _SF_MARKER)
    try:
        with open(marker) as f:
            if f.read().strip() == marker_value(sf_dir):
                return _FOREST_STAGE
    except OSError:
        pass
    forest = scaled_forest()
    # Four-path certification contract (ADVICE r6): the m1b join walk, m1d
    # compiled CASE, and DuckDB oracle all omit base_score and default_left
    # NaN routing. That is sound ONLY because (a) the staged forest's
    # base_score is zero — asserted here — and (b) the _FEATURES
    # expressions over orders are non-null (pinned by
    # tests/test_plan_quality.py::test_m1_feature_expressions_are_non_null
    # and guarded at run time by m1c's per-batch NaN check).
    # load-bearing invariant (soundness of three inference paths) — a real
    # raise, not an assert, so `python -O` cannot strip it (ADVICE r7)
    if forest.base_score != 0.0:
        raise ValueError(
            f"staged forest must have base_score 0, got {forest.base_score!r}"
            " — m1b/m1d and the DuckDB oracle omit the margin offset"
        )
    save_forest(spark, forest, _FOREST_STAGE)
    with open(marker, "w") as f:
        f.write(marker_value(sf_dir))
    return _FOREST_STAGE


def _m1b_oracle(stage: str = _FOREST_STAGE, where: str = "") -> str:
    from bigdatabowl_spark.plans.advanced import _FEATURES

    fv = ", ".join(e for e, _ in _FEATURES)
    walk = []
    for lvl in range(_FOREST_DEPTH):
        walk.append(
            f"""l{lvl + 1} AS (
        SELECT s.o_orderkey, s.tree_id, s.fv,
               CASE WHEN n.lc = -1 THEN s.node
                    WHEN s.fv[n.feat + 1] < n.thr THEN n.lc
                    ELSE n.rc END AS node
        FROM l{lvl} s
        JOIN nodes n ON n.tree_id = s.tree_id AND n.node_id = s.node
    )"""
        )
    return f"""
    WITH feats AS (
        SELECT o_orderkey, [{fv}] AS fv FROM orders {where}
    ),
    nodes AS (SELECT * FROM read_parquet('{stage}/nodes/*.parquet')),
    trees AS (SELECT * FROM read_parquet('{stage}/trees/*.parquet')),
    l0 AS (
        SELECT f.o_orderkey, t.tree_id, f.fv, 0 AS node
        FROM feats f CROSS JOIN trees t
    ),
    {', '.join(walk)}
    SELECT s.o_orderkey, CAST(t.tree_class AS BIGINT) AS cls,
           CAST(SUM(CAST(floor(n.leaf_val * 1000000000.0) AS BIGINT)) AS BIGINT)
               AS margin_q,
           CAST(SUM(CASE WHEN n.lc = -1 THEN 0 ELSE 1 END) AS BIGINT)
               AS unresolved
    FROM l{_FOREST_DEPTH} s
    JOIN nodes n ON n.tree_id = s.tree_id AND n.node_id = s.node
    JOIN trees t ON t.tree_id = s.tree_id
    GROUP BY 1, 2
    """


@register("m1b_forest_score", "M1,M2,S6,S4,J1,A1", None)
def m1b_forest_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-depth forest inference with the MODEL AS DATA: the staged
    depth-4 node relation is broadcast and traversal is depth-many
    broadcast-hash joins — one per level — updating (row, tree) → node;
    per-class margins accumulate as exact integer nano-units. The oracle
    runs the identical walk in DuckDB over the same staged parquet.

    Spark-first shape: the 26-feature vector is one `array()` column
    gathered with `element_at` (no unpivot shuffle); the few-hundred-row
    node/tree relations are broadcast, so the whole walk is map-side —
    the ONLY shuffle is the final (row, class) margin aggregation. The
    16× tree fan-out is the inference width, map-local and linear.

    `unresolved` must be 0 everywhere: every (row, tree) state lands on a
    leaf within depth rounds — the traversal-completeness invariant."""
    _stage_forest(spark, sf_dir)
    return _walk_score(spark, sf_dir, _FOREST_STAGE)


def _walk_score(
    spark: SparkSession, sf_dir: str, stage: str, where: str | None = None
) -> DataFrame:
    """The m1b relational join-walk over an arbitrary staged forest dir
    (shared with the dart-staged certification, m1e)."""
    from bigdatabowl_spark.plans.advanced import _FEATURES

    nodes = spark.read.parquet(os.path.join(stage, "nodes"))
    trees = spark.read.parquet(os.path.join(stage, "trees"))
    fv = F.array(*[F.expr(e) for e, _ in _FEATURES]).alias("fv")
    orders = t(spark, sf_dir, "orders")
    if where:
        orders = orders.where(where)
    state = (
        orders
        .select("o_orderkey", fv)
        .crossJoin(F.broadcast(trees.select("tree_id")))
        .withColumn("node", F.lit(0))
    )
    for _ in range(_FOREST_DEPTH):
        n = F.broadcast(
            nodes.select(
                F.col("tree_id").alias("n_tree"),
                F.col("node_id").alias("n_node"),
                "feat", "thr", "lc", "rc",
            )
        )
        state = (
            state.join(
                n,
                (F.col("n_tree") == F.col("tree_id"))
                & (F.col("n_node") == F.col("node")),
            )
            .withColumn(
                "node",
                F.when(F.col("lc") == -1, F.col("node"))
                .when(
                    F.element_at(F.col("fv"), F.col("feat") + 1) < F.col("thr"),
                    F.col("lc"),
                )
                .otherwise(F.col("rc")),
            )
            .select("o_orderkey", "tree_id", "fv", "node")
        )
    leaf = F.broadcast(
        nodes.select(
            F.col("tree_id").alias("n_tree"),
            F.col("node_id").alias("n_node"),
            "lc", "leaf_val",
        )
    )
    cls = F.broadcast(trees.select("tree_id", "tree_class"))
    return (
        state.join(
            leaf,
            (F.col("n_tree") == F.col("tree_id"))
            & (F.col("n_node") == F.col("node")),
        )
        .join(cls, "tree_id")
        .groupBy("o_orderkey", F.col("tree_class").cast("bigint").alias("cls"))
        .agg(
            F.sum(F.floor(F.col("leaf_val") * 1000000000.0).cast("bigint"))
            .cast("bigint")
            .alias("margin_q"),
            F.sum(F.when(F.col("lc") == -1, 0).otherwise(1))
            .cast("bigint")
            .alias("unresolved"),
        )
    )


# register the oracle lazily-built SQL (needs _FEATURES import at module load)
from bigdatabowl_spark.plans.catalog import CATALOG as _CAT  # noqa: E402
from dataclasses import replace as _replace  # noqa: E402

_CAT["m1b_forest_score"] = _replace(_CAT["m1b_forest_score"], oracle=_m1b_oracle())


@register("m1c_forest_udf_score", "M1,M2,S4,S6,A1", None)
def m1c_forest_udf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION inference path for models too large to join against:
    the staged forest loads once per executor process and scores Arrow
    batches in-place via mapInPandas — the engine's `predict_batch_udf`
    shape (the reference loads its treelite binaries exactly this way,
    play_eppa_cpu.py:80-87, then scores 264k-row batches).

    Emits the SAME relation as m1b_forest_score — (o_orderkey, cls,
    margin_q, unresolved) with integer nano-unit margins — and is checked
    against the SAME DuckDB node-walk oracle, so the three inference paths
    (relational join walk, vectorized NumPy UDF, DuckDB SQL) are certified
    identical on one model. Map-only: the model never shuffles, rows never
    fan out 16×; the only exchange is whatever the sink needs.

    Unlike the join/CASE/SQL walks (which require non-null features —
    staged-forest contract, see _stage_forest), this path implements the
    FULL FlatForest semantics: NaN features route per node default_left,
    and `unresolved` is COMPUTED (count of (row, tree) states not on a
    leaf after depth rounds), not hardcoded (ADVICE r6) — so a NaN
    sneaking into the feature expressions shows up as a certification
    hash mismatch instead of four silently-agreeing wrong paths."""
    _stage_forest(spark, sf_dir)
    return _udf_score(spark, sf_dir, _FOREST_STAGE)


def _udf_score(
    spark: SparkSession, sf_dir: str, stage: str, where: str | None = None
) -> DataFrame:
    """The m1c mapInPandas scorer over an arbitrary staged forest dir
    (shared with the dart-staged certification, m1e)."""
    import pandas as pd

    from bigdatabowl_spark.plans.advanced import _FEATURES

    def score(batches):
        import numpy as np

        from bigdatabowl_spark.sources.artifacts import load_forest_arrays

        forest = load_forest_arrays(stage)  # per-process cached, no JVM
        n_class = len(forest.epvals)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            X = pdf[[f"f{i}" for i in range(26)]].to_numpy(np.float64)
            rows = np.arange(n)
            acc = np.zeros((n, n_class), dtype=np.int64)
            unres = np.zeros((n, n_class), dtype=np.int64)
            any_nan = bool(np.isnan(X).any())
            for tr in range(forest.n_trees):
                cur = np.full(n, forest.offsets[tr], dtype=np.int64)
                for _ in range(int(forest.depth[tr])):
                    f = forest.feat[cur]
                    x = X[rows, f]
                    go_left = x < forest.thr[cur]
                    if any_nan:
                        isnan = np.isnan(x)
                        if isnan.any():
                            go_left = np.where(
                                isnan, forest.default_left[cur], go_left
                            )
                    cur = np.where(go_left, forest.left[cur], forest.right[cur])
                q = np.floor(forest.leaf_val[cur] * 1000000000.0).astype(np.int64)
                acc[:, forest.tree_class[tr]] += q
                unres[:, forest.tree_class[tr]] += forest.left[cur] != cur
            out = pd.DataFrame(
                {
                    "o_orderkey": np.repeat(
                        pdf["o_orderkey"].to_numpy(), n_class
                    ),
                    "cls": np.tile(np.arange(n_class, dtype=np.int64), n),
                    "margin_q": acc.reshape(-1),
                    "unresolved": unres.reshape(-1),
                }
            )
            yield out

    orders = t(spark, sf_dir, "orders")
    if where:
        orders = orders.where(where)
    feats = orders.select(
        "o_orderkey",
        *[F.expr(e).alias(f"f{i}") for i, (e, _) in enumerate(_FEATURES)],
    )
    return feats.mapInPandas(
        score, "o_orderkey long, cls long, margin_q long, unresolved long"
    )


_CAT["m1c_forest_udf_score"] = _replace(
    _CAT["m1c_forest_udf_score"], oracle=_m1b_oracle()
)


def _compile_forest_sql(forest) -> dict[int, str]:
    """Compile a FlatForest into per-class margin SQL — the engine's
    treelite step (the reference compiles its xgboost trees to native
    code, play_eppa_cpu.py:24-28,80-87; here the target is Catalyst →
    WholeStageCodegen instead of a .so).

    Each tree becomes a nested CASE mirror of its node arrays at ANY
    depth; thresholds and leaves print via repr (exact float64 round
    trip). Per-tree leaves are floor-quantized to integer nano-units
    BEFORE the per-class '+' chain, so class margins are order-free
    integer sums matching the m1b/m1c relation exactly."""
    from bigdatabowl_spark.plans.advanced import _FEATURES

    def tree_sql(t: int) -> str:
        nodes = forest.tree_nodes(t)
        lc, rc = nodes["left_children"], nodes["right_children"]
        si, sc = nodes["split_indices"], nodes["split_conditions"]

        def rec(i: int) -> str:
            if lc[i] == -1:
                return f"CAST({sc[i]!r} AS DOUBLE)"
            feat = _FEATURES[si[i]][0]
            return (
                f"CASE WHEN {feat} < {sc[i]!r} THEN {rec(lc[i])} "
                f"ELSE {rec(rc[i])} END"
            )

        return f"CAST(floor(({rec(0)}) * 1000000000.0) AS BIGINT)"

    per_class: dict[int, list[str]] = {}
    for t in range(forest.n_trees):
        per_class.setdefault(int(forest.tree_class[t]), []).append(tree_sql(t))
    return {c: "(" + " + ".join(exprs) + ")" for c, exprs in per_class.items()}


@register("m1d_forest_compiled_score", "M1,M2,S6,P10,F4", None)
def m1d_forest_compiled_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPILED inference path: the staged depth-4 forest is loaded
    (S6) and compiled to nested-CASE SQL that runs entirely inside
    WholeStageCodegen — the reference's treelite compilation re-targeted
    at Catalyst. Emits the same (o_orderkey, cls, margin_q, unresolved)
    relation as m1b/m1c and is checked against the same DuckDB node-walk
    oracle, so all FOUR inference paths — compiled CASE, relational join
    walk, vectorized NumPy UDF, SQL walk — are certified identical on one
    staged model. Map-only: zero joins, zero Python; the unpivot to
    (cls, margin_q) rows is a per-row stack()."""
    _stage_forest(spark, sf_dir)
    return _compiled_score(spark, sf_dir, _FOREST_STAGE)


def _compiled_score(
    spark: SparkSession, sf_dir: str, stage: str, where: str | None = None
) -> DataFrame:
    """The m1d compiled nested-CASE scorer over an arbitrary staged forest
    dir (shared with the dart-staged certification, m1e)."""
    from bigdatabowl_spark.sources.artifacts import load_forest

    forest = load_forest(spark, stage)
    margins = _compile_forest_sql(forest)
    n_class = forest.n_classes
    stack_args = ", ".join(
        f"CAST({c} AS BIGINT), m{c}" for c in range(n_class)
    )
    orders = t(spark, sf_dir, "orders")
    if where:
        orders = orders.where(where)
    return (
        orders
        .select(
            "o_orderkey",
            *[F.expr(m).alias(f"m{c}") for c, m in sorted(margins.items())],
        )
        .select(
            "o_orderkey",
            F.expr(f"stack({n_class}, {stack_args}) AS (cls, margin_q)"),
        )
        .withColumn("unresolved", F.lit(0).cast("long"))
    )


_CAT["m1d_forest_compiled_score"] = _replace(
    _CAT["m1d_forest_compiled_score"], oracle=_m1b_oracle()
)


# --------------------------------------------------------------------------
# Dart through the four-path certification (VERDICT r7 item 7)
# --------------------------------------------------------------------------

_DART_STAGE = os.path.join(KERNEL_OUT, "m1e_dart_forest")
_M1E_WHERE = "o_orderkey % 10 = 0"  # 10% deterministic slice; all paths+oracle


def _stage_dart_forest(spark: SparkSession, sf_dir: str) -> str:
    """Stage the forest obtained by LOADING A DART DOCUMENT: the depth-4
    forest is serialized to xgboost JSON, rewrapped in dart's nested
    layout (gradient_booster.model.gbtree + per-tree weight_drop), and
    re-loaded through forest_from_xgb_json, which folds each tree's drop
    weight into its leaves (xgb_json.py module doc). 12 of 16 drop
    weights are ≠ 1, so a loader that ignored the nesting or the weights
    would stage different leaf bytes and hash-fail all four paths."""
    from bigdatabowl_spark.kernels.xgb_json import (
        forest_from_xgb_json,
        forest_to_xgb_json,
    )
    from bigdatabowl_spark.sources.artifacts import save_forest

    marker = os.path.join(_DART_STAGE, _SF_MARKER)
    try:
        with open(marker) as f:
            if f.read().strip() == marker_value(sf_dir):
                return _DART_STAGE
    except OSError:
        pass
    base = scaled_forest()
    doc = forest_to_xgb_json(base)
    booster = doc["learner"]["gradient_booster"]
    n_trees = base.n_trees
    # deterministic drop weights: exactly representable dyadics so the
    # leaf folding (w * leaf) is one exact float multiply in any engine
    weight_drop = [
        1.0 if tr % 4 == 0 else 0.5 + 0.0625 * (tr % 8) for tr in range(n_trees)
    ]
    doc["learner"]["gradient_booster"] = {
        "name": "dart",
        "model": {"gbtree": booster["model"], "weight_drop": weight_drop},
    }
    forest = forest_from_xgb_json(doc)
    if forest.base_score != 0.0:
        raise ValueError(
            f"dart-staged forest must have base_score 0, got "
            f"{forest.base_score!r} — the walk paths omit the margin offset"
        )
    # the staged bytes must actually differ from the plain-gbtree forest —
    # otherwise this query would certify nothing beyond m1b
    import numpy as np

    is_leaf = base.left == np.arange(len(base.left))
    if np.array_equal(forest.leaf_val[is_leaf], base.leaf_val[is_leaf]):
        raise ValueError("dart weight_drop folded to a no-op — staging bug")
    save_forest(spark, forest, _DART_STAGE)
    with open(marker, "w") as f:
        f.write(marker_value(sf_dir))
    return _DART_STAGE


def _m1e_oracle() -> str:
    """The DuckDB node walk over the dart-staged relation, fanned out to
    the three Spark path labels (same values per path by construction)."""
    base = _m1b_oracle(stage=_DART_STAGE, where=f"WHERE {_M1E_WHERE}")
    return f"""
    WITH base AS ({base})
    SELECT p.path, b.o_orderkey, b.cls, b.margin_q, b.unresolved
    FROM base b
    CROSS JOIN (SELECT unnest(['compiled', 'join_walk', 'udf']) AS path) p
    """


@register("m1e_dart_forest_score", "M1,M2,S4,S6,J1,P10,A1", None)
def m1e_dart_forest_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All THREE Spark inference paths — relational join walk (m1b),
    vectorized NumPy UDF (m1c), compiled nested-CASE (m1d) — run over the
    DART-STAGED forest and emit path-labeled rows; the DuckDB oracle walks
    the same staged relation once and cross-joins the three labels. A
    single green driver row therefore certifies that a real dart document
    (nested layout, weight_drop ≠ 1 on 12 of 16 trees) scores identically
    through four independent engines — the loader's weight folding is
    load-bearing, not decorative (VERDICT r7 item 7; loader fuzzed in
    tests/test_xgb_json.py::test_dart_document_unwraps_nesting_...).

    A deterministic 10% orders slice keeps the 3× scoring fan-out cheap;
    the filter is pushed to every path AND the oracle."""
    stage = _stage_dart_forest(spark, sf_dir)
    parts = [
        ("join_walk", _walk_score(spark, sf_dir, stage, _M1E_WHERE)),
        ("udf", _udf_score(spark, sf_dir, stage, _M1E_WHERE)),
        ("compiled", _compiled_score(spark, sf_dir, stage, _M1E_WHERE)),
    ]
    out = None
    for label, df in parts:
        labeled = df.select(
            F.lit(label).alias("path"),
            "o_orderkey", "cls", "margin_q", "unresolved",
        )
        out = labeled if out is None else out.unionByName(labeled)
    return out


_CAT["m1e_dart_forest_score"] = _replace(
    _CAT["m1e_dart_forest_score"], oracle=_m1e_oracle()
)


# --------------------------------------------------------------------------
# Vocabulary encoding — the tokenize→encode step of a pretraining pipeline
# --------------------------------------------------------------------------

VOCAB_SIZE = 256  # id space 0..255; OOV id = VOCAB_SIZE


@register(
    "encode_tokens",
    "TT2,TT5,J1,O2,A7",
    f"""
    WITH toks AS (
        SELECT doc_id, u.tok, u.pos FROM (
            SELECT doc_id, string_split(text, ' ') AS arr FROM documents
        ), LATERAL (SELECT unnest(arr) AS tok, unnest(range(len(arr))) AS pos) u
    ),
    vocab AS (
        SELECT tok,
               CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) - 1 AS BIGINT)
                   AS token_id
        FROM (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
              ORDER BY n DESC, tok LIMIT {VOCAB_SIZE})
    )
    SELECT t.doc_id, CAST(t.pos AS BIGINT) AS pos,
           CAST(COALESCE(v.token_id, {VOCAB_SIZE}) AS BIGINT) AS token_id
    FROM toks t LEFT JOIN vocab v USING (tok)
    """,
)
def encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary encoding: corpus-frequency vocab (top-VOCAB_SIZE=256
    tokens, ids assigned in (count desc, token asc) order) applied to every
    document as an exploded (doc_id, pos, token_id) relation with OOV id
    256 — the tokenize→encode step every pretraining pipeline runs
    before `pack_sequences` lays packs out.

    Scale shape, the part that matters at 100 TB: the vocab derivation
    NEVER globally sorts the full token-frequency table (a web corpus has
    billions of unique tokens). Frequencies partial-aggregate map-side,
    top-V rides orderBy().limit(V) — TakeOrderedAndProject, per-partition
    top-V + constant driver merge — and ONLY the V-row result gets the
    single-partition row_number window (constant-size by construction).
    Encoding is a broadcast left join: map-only, no shuffle of the token
    stream. The per-token explode is the unavoidable linear fan-out.
    """
    from pyspark.sql import Window

    from bigdatabowl_spark.operators.text import tokens

    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("n"))
    top = counts.orderBy(F.desc("n"), F.asc("tok")).limit(VOCAB_SIZE)
    vocab = top.select(
        "tok",
        (
            F.row_number().over(Window.orderBy(F.desc("n"), F.asc("tok"))) - 1
        ).cast("bigint").alias("token_id"),
    )
    return toks.join(F.broadcast(vocab), "tok", "left").select(
        "doc_id",
        F.col("pos").cast("bigint").alias("pos"),
        F.coalesce(F.col("token_id"), F.lit(VOCAB_SIZE).cast("bigint")).alias(
            "token_id"
        ),
    )


# --------------------------------------------------------------------------
# Bigram language-model scoring — the CCNet-style perplexity quality filter
# --------------------------------------------------------------------------


@register(
    "ngram_lm_score",
    "TQ3,TT3,TT1,A7,J2",
    """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS arr FROM documents
    ),
    bi AS (
        SELECT doc_id, arr[i.x + 1] AS a, arr[i.x + 2] AS b
        FROM toks, LATERAL (SELECT unnest(range(len(arr) - 1)) AS x) i
    ),
    vocab AS (
        SELECT COUNT(DISTINCT u.tok) AS v
        FROM (SELECT unnest(arr) AS tok FROM toks) u
    ),
    nab AS (SELECT a, b, COUNT(*) AS n_ab FROM bi GROUP BY a, b),
    na AS (SELECT a, COUNT(*) AS n_a FROM bi GROUP BY a)
    SELECT bi.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CAST(round(ln((n_a + v) / (n_ab + 1)) * 1e6) AS BIGINT))
                AS BIGINT) AS nll_micro,
           CAST(FLOOR(CAST(SUM(CAST(round(ln((n_a + v) / (n_ab + 1)) * 1e6)
                                    AS BIGINT)) AS DOUBLE) / COUNT(*))
                AS BIGINT) AS avg_nll_micro
    FROM bi
    JOIN nab USING (a, b)
    JOIN na USING (a)
    CROSS JOIN vocab
    GROUP BY bi.doc_id
    """,
)
def ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring: fit an add-1-smoothed bigram LM on the
    corpus itself, then score every document's negative log-likelihood —
    the perplexity-based quality filter (CCNet-style) that pretraining
    pipelines run between heuristic filters and model-based classifiers.
    P(b|a) = (c(a,b)+1) / (c(a·)+V); per-bigram surprisal is emitted in
    integer micro-nats so the cross-engine hash never sums raw doubles
    (−ln P = ln((c(a·)+V)/(c(a,b)+1)), argument > 1, one IEEE division of
    exact integers then ln, rounded half-up at 1e-6 — the catalog's
    transcendental rule). Docs with <2 tokens have no bigram events and are
    absent by construction in both engines.

    Scale shape: bigram extraction is a map-only array transform (no
    window, no shuffle, no self-join to form pairs); the LM tables are
    groupBy partial-aggregates shuffled once on their own keys; scoring
    re-joins the bigram stream to the counts on the SAME (a,b)/(a) keys —
    plain equi-joins that AQE sizes (broadcast at this sf; shuffle-hash at
    web scale where the bigram table is billions of rows and no side
    broadcasts). The vocab size V is a 1-row scalar broadcast.
    """
    from bigdatabowl_spark.operators.text import tokens

    docs = t(spark, sf_dir, "documents")
    arr_df = docs.select("doc_id", tokens(F.col("text")).alias("arr"))
    bi = arr_df.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(arr, 1, size(arr) - 1),"
                " (x, i) -> struct(x AS a, arr[i + 1] AS b))"
            )
        ).alias("p"),
    ).select("doc_id", "p.a", "p.b")
    vocab = (
        arr_df.select(F.explode("arr").alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    nab = bi.groupBy("a", "b").agg(F.count("*").alias("n_ab"))
    na = bi.groupBy("a").agg(F.count("*").alias("n_a"))
    term = F.round(
        F.log((F.col("n_a") + F.col("v")) / (F.col("n_ab") + F.lit(1))) * 1e6
    ).cast("long")
    scored = (
        bi.join(nab, ["a", "b"])
        .join(na, ["a"])
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", term.alias("nll_term_micro"))
    )
    out = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("nll_term_micro").cast("long").alias("nll_micro"),
    )
    return out.select(
        "doc_id",
        "n_bigrams",
        "nll_micro",
        F.floor(F.col("nll_micro").cast("double") / F.col("n_bigrams"))
        .cast("long")
        .alias("avg_nll_micro"),
    )


# --------------------------------------------------------------------------
# ANN recall certification — IVF candidates vs brute-force ground truth
# --------------------------------------------------------------------------


def _sim_recall_oracle() -> str:
    brute = _CAT["embed_knn_brute"].oracle
    ivf = _CAT["embed_ivf_knn"].oracle
    return f"""
    WITH brute AS ({brute}),
    ivf AS ({ivf}),
    marked AS (
        SELECT b.query_id, CASE WHEN i.query_id IS NULL THEN 0 ELSE 1 END AS hit
        FROM brute b LEFT JOIN ivf i
          ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
    )
    SELECT query_id,
           CAST(SUM(hit) AS BIGINT) AS n_hits,
           CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(hit) * 10000 // COUNT(*) AS BIGINT) AS recall_bp
    FROM marked GROUP BY query_id
    """


@register("sim_recall_certify", "SIM1,SIM3,U4,A7,J2", None)
def sim_recall_certify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN recall certification: per-query recall@5 of the IVF-probed
    top-5 (`embed_ivf_knn`) against the brute-force ground truth
    (`embed_knn_brute`), in integer basis points — the accuracy-vs-cost
    audit every approximate index needs before it replaces the exact scan
    (same certify pattern as `a7c_sketch_certify` for sketches).

    Scale shape: both sides are the already-audited catalog plans; the
    certification itself is two equi-joins + a groupBy on query_id — at
    real scale ground truth is computed for a small held-out query sample
    (here: the same id<20 panel both queries share), so the join input is
    O(sample·k), never O(corpus).
    """
    brute = _CAT["embed_knn_brute"].builder(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    ivf = _CAT["embed_ivf_knn"].builder(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    marked = brute.join(ivf, ["query_id", "neighbor_id"], "left")
    return marked.groupBy("query_id").agg(
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
        F.count("*").cast("long").alias("k"),
        F.floor(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))) * 10000 / F.count("*")
        ).cast("long").alias("recall_bp"),
    )


_CAT["sim_recall_certify"] = _replace(
    _CAT["sim_recall_certify"], oracle=_sim_recall_oracle()
)


# --------------------------------------------------------------------------
# VariantType semi-structured access — parse once, typed gets many
# --------------------------------------------------------------------------


@register(
    "f_variant_props",
    "MD1,F11,A1,P14",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_sum,
           MAX(props->>'k') AS k_str_max,
           CAST(COUNT(CAST(props->>'absent' AS BIGINT)) AS BIGINT)
               AS n_absent
    FROM events
    GROUP BY event_type
    """,
)
def f_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VariantType: the props JSON
    is parsed ONCE per row (`parse_json` → open binary encoding), then
    every path access is a typed `variant_get` on the parsed value — the
    schema-on-read posture for 100 TB event logs, vs `f_json_props`'
    get_json_object which re-parses the string per path. A missing path
    through `try_variant_get` yields NULL (counted, to pin the semantics
    cross-engine against DuckDB's ->> on an absent key).

    Scale: in production the variant column is WRITTEN to parquet once at
    ingest (shredded binary, no re-parse ever again); here parse + access
    fuse into one codegen'd projection — still a single parse per row.
    """
    ev = t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "bigint")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).cast("long").alias("k_sum"),
        F.max(F.variant_get(v, "$.k", "string")).alias("k_str_max"),
        F.count(F.try_variant_get(v, "$.absent", "bigint"))
        .cast("long")
        .alias("n_absent"),
    )
