"""Prior-artifact lifecycle: fit → parquet → reload → broadcast (S4/S5/S11).

The reference persists its historical priors as CSV artifacts (in/p_t.csv,
in/T_given_L.csv) and reloads them into ndarrays at kernel start
(play_eppa_cpu.py:72-77). Spark-first equivalent: priors live relationally as
parquet tables (partition-prunable, schema-checked), and are reconstructed
into the small dense ndarrays only at the kernel boundary, where they ride
the applyInPandas closure (one broadcast per executor).

The reload collect is bounded by construction — p_t is 54 rows, P(T|L) is
60×40 = 2,400 rows — so the driver-side materialization is a few KB no
matter the corpus scale that produced the fit.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import SparkSession

from bigdatabowl_spark.kernels.ensemble import FlatForest, TreeEnsemble
from bigdatabowl_spark.kernels.eppa import EppaPriors
from bigdatabowl_spark.sources.tables import local_rows_df
from bigdatabowl_spark.kernels.priors import (
    T_given_L_prior,
    p_t_prior,
    priors_to_tables,
)

# Artifact root inside the repo tree (absolute so foreign-cwd driver sessions
# resolve the same location as test sessions).
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEFAULT_ARTIFACT_DIR = os.path.join(_REPO_ROOT, "spark-warehouse", "artifacts", "priors")


def save_priors(
    spark: SparkSession,
    out_dir: str = DEFAULT_ARTIFACT_DIR,
    priors: EppaPriors | None = None,
) -> dict[str, str]:
    """Persist the prior arrays as parquet tables (overwrite → idempotent,
    the S12 resume property: a re-run converges to the same artifact)."""
    priors = priors or EppaPriors.default()
    p_t_df, t_l_df = priors_to_tables(spark, priors.p_t, priors.T_given_L)
    paths = {
        "p_t": os.path.join(out_dir, "p_t"),
        "T_given_L": os.path.join(out_dir, "T_given_L"),
    }
    # coalesce(1): each artifact is ≤2,400 rows — one file per artifact reads
    # back with a single task and no small-file explosion
    p_t_df.coalesce(1).write.mode("overwrite").parquet(paths["p_t"])
    t_l_df.coalesce(1).write.mode("overwrite").parquet(paths["T_given_L"])
    return paths


def load_priors(spark: SparkSession, out_dir: str = DEFAULT_ARTIFACT_DIR) -> EppaPriors:
    """Reload parquet prior artifacts into dense ndarrays (S5: table → tensor).

    Missing-value cells default to 0.0; shapes are fixed by the artifact
    contract (p_t: 54, T|L: 60×40) exactly as the reference's reshape
    assumes (play_eppa_cpu.py:73).
    """
    p_t_rows = spark.read.parquet(os.path.join(out_dir, "p_t")).collect()
    p_t = np.zeros(54, dtype=np.float64)
    for r in p_t_rows:
        p_t[r["frame_to_pass"] - 1] = r["p"]
    t_l_rows = spark.read.parquet(os.path.join(out_dir, "T_given_L")).collect()
    T_L = np.zeros((60, 40), dtype=np.float64)
    for r in t_l_rows:
        T_L[r["dist"] - 1, r["T"] - 1] = r["p"]
    return EppaPriors(p_t=p_t, T_given_L=T_L)


def roundtrip_priors(spark: SparkSession, out_dir: str = DEFAULT_ARTIFACT_DIR) -> EppaPriors:
    """Full save→reload cycle returning the reloaded priors."""
    save_priors(spark, out_dir)
    return load_priors(spark, out_dir)


# --------------------------------------------------------------------------
# Model-binary lifecycle (S6): tree-ensemble spec → parquet → reload
# --------------------------------------------------------------------------
# The reference loads version-pinned serialized model binaries at kernel
# start (play_eppa_cpu.py:80-87, treelite .so + xgboost .model). The engine's
# equivalent model binary is the TreeEnsemble spec — a 16-row parquet table
# (one row per depth-2 tree) plus an 8-row class-value table. float64 values
# round-trip bit-exactly through parquet, so a reloaded ensemble scores
# bit-identically to the in-memory spec; q_m2_value_model_width certifies
# this in-query the way s4_prior_artifact_lifecycle does for priors.

DEFAULT_ENSEMBLE_DIR = os.path.join(_REPO_ROOT, "spark-warehouse", "artifacts", "ensemble")

_TREE_SCHEMA = (
    "tree_id int, tree_class int, feat_a int, thr_a double, "
    "feat_b int, thr_b double, leaves array<double>"
)


def save_ensemble(
    spark: SparkSession,
    ens: TreeEnsemble | None = None,
    out_dir: str = DEFAULT_ENSEMBLE_DIR,
) -> dict[str, str]:
    """Persist a TreeEnsemble as parquet model artifacts (S6/S11; overwrite →
    idempotent resume, the S12 property)."""
    ens = ens or TreeEnsemble.default()
    tree_rows = [
        (
            t,
            int(ens.tree_class[t]),
            int(ens.feat_a[t]),
            float(ens.thr_a[t]),
            int(ens.feat_b[t]),
            float(ens.thr_b[t]),
            [float(v) for v in ens.leaves[t]],
        )
        for t in range(len(ens.feat_a))
    ]
    ep_rows = [(c, float(v)) for c, v in enumerate(ens.epvals)]
    paths = {
        "trees": os.path.join(out_dir, "trees"),
        "epvals": os.path.join(out_dir, "epvals"),
    }
    # coalesce(1): a 16-row / 8-row artifact is one file, one read task
    local_rows_df(spark, tree_rows, _TREE_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(paths["trees"])
    local_rows_df(spark, ep_rows, "class_id int, epval double").coalesce(1).write.mode(
        "overwrite"
    ).parquet(paths["epvals"])
    return paths


def load_ensemble(spark: SparkSession, out_dir: str = DEFAULT_ENSEMBLE_DIR) -> TreeEnsemble:
    """Reload parquet model artifacts into a TreeEnsemble (S6: binary → model).

    Row order is restored from the explicit tree_id/class_id columns, so the
    rebuild is deterministic regardless of file/task read order.
    """
    tree_rows = sorted(
        spark.read.parquet(os.path.join(out_dir, "trees")).collect(),
        key=lambda r: r["tree_id"],
    )
    ep_rows = sorted(
        spark.read.parquet(os.path.join(out_dir, "epvals")).collect(),
        key=lambda r: r["class_id"],
    )
    return TreeEnsemble(
        feat_a=np.array([r["feat_a"] for r in tree_rows], dtype=np.int64),
        thr_a=np.array([r["thr_a"] for r in tree_rows], dtype=np.float64),
        feat_b=np.array([r["feat_b"] for r in tree_rows], dtype=np.int64),
        thr_b=np.array([r["thr_b"] for r in tree_rows], dtype=np.float64),
        leaves=np.array([r["leaves"] for r in tree_rows], dtype=np.float64),
        tree_class=np.array([r["tree_class"] for r in tree_rows], dtype=np.int64),
        epvals=np.array([r["epval"] for r in ep_rows], dtype=np.float64),
    )


def roundtrip_ensemble(
    spark: SparkSession,
    ens: TreeEnsemble | None = None,
    out_dir: str = DEFAULT_ENSEMBLE_DIR,
) -> TreeEnsemble:
    """Full save→reload cycle returning the reloaded ensemble."""
    save_ensemble(spark, ens, out_dir)
    return load_ensemble(spark, out_dir)


# --------------------------------------------------------------------------
# Arbitrary-depth forest lifecycle (S6): xgboost-shape model → parquet →
# reload. The node relation is one row per tree node in xgboost's local
# layout (leaf children -1, leaf values in leaf_val), so a real model.json
# of ANY depth persists losslessly — the r6 generalization of the depth-2
# ensemble artifact above (reference: play_eppa_cpu.py:80-87 loads
# default-depth xgboost, Rishav's xyac.ipynb · cells 5-11).
# --------------------------------------------------------------------------

DEFAULT_FOREST_DIR = os.path.join(_REPO_ROOT, "spark-warehouse", "artifacts", "forest")

_NODE_SCHEMA = (
    "tree_id int, node_id int, feat int, thr double, "
    "lc int, rc int, default_left boolean, leaf_val double"
)


def save_forest(
    spark: SparkSession,
    forest: FlatForest | None = None,
    out_dir: str = DEFAULT_FOREST_DIR,
) -> dict[str, str]:
    """Persist a FlatForest as parquet model artifacts (S6/S11; overwrite →
    idempotent resume, the S12 property). float64 round-trips bit-exactly,
    so the reloaded forest scores bit-identically."""
    forest = forest if forest is not None else FlatForest.default_deep()
    node_rows = []
    for t in range(forest.n_trees):
        nodes = forest.tree_nodes(t)
        for i in range(len(nodes["left_children"])):
            node_rows.append(
                (
                    t,
                    i,
                    int(nodes["split_indices"][i]),
                    float(nodes["split_conditions"][i])
                    if nodes["left_children"][i] != -1
                    else 0.0,
                    int(nodes["left_children"][i]),
                    int(nodes["right_children"][i]),
                    bool(nodes["default_left"][i]),
                    float(nodes["split_conditions"][i])
                    if nodes["left_children"][i] == -1
                    else 0.0,
                )
            )
    tree_rows = [(t, int(c)) for t, c in enumerate(forest.tree_class)]
    ep_rows = [(c, float(v)) for c, v in enumerate(forest.epvals)]
    meta_rows = [("base_score", float(forest.base_score))]
    paths = {
        "nodes": os.path.join(out_dir, "nodes"),
        "trees": os.path.join(out_dir, "trees"),
        "epvals": os.path.join(out_dir, "epvals"),
        "meta": os.path.join(out_dir, "meta"),
    }
    # coalesce(1): a few-hundred-row artifact is one file, one read task
    local_rows_df(spark, node_rows, _NODE_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(paths["nodes"])
    local_rows_df(spark, tree_rows, "tree_id int, tree_class int").coalesce(1).write.mode("overwrite").parquet(paths["trees"])
    local_rows_df(spark, ep_rows, "class_id int, epval double").coalesce(1).write.mode("overwrite").parquet(paths["epvals"])
    local_rows_df(spark, meta_rows, "key string, value double").coalesce(1).write.mode("overwrite").parquet(paths["meta"])
    return paths


def load_forest(spark: SparkSession, out_dir: str = DEFAULT_FOREST_DIR) -> FlatForest:
    """Reload parquet model artifacts into a FlatForest (S6: binary → model).

    Row order is restored from the explicit tree_id/node_id columns, so the
    rebuild is deterministic regardless of file/task read order."""
    node_rows = sorted(
        spark.read.parquet(os.path.join(out_dir, "nodes")).collect(),
        key=lambda r: (r["tree_id"], r["node_id"]),
    )
    tree_rows = sorted(
        spark.read.parquet(os.path.join(out_dir, "trees")).collect(),
        key=lambda r: r["tree_id"],
    )
    ep_rows = sorted(
        spark.read.parquet(os.path.join(out_dir, "epvals")).collect(),
        key=lambda r: r["class_id"],
    )
    meta = {
        r["key"]: r["value"]
        for r in spark.read.parquet(os.path.join(out_dir, "meta")).collect()
    }
    # one linear pass over the (tree_id, node_id)-sorted rows — a real
    # default-depth model is hundreds of trees × 127 nodes, so a per-tree
    # scan of all rows would be O(trees × nodes) on the driver
    from itertools import groupby

    trees = []
    for _, grp in groupby(node_rows, key=lambda r: r["tree_id"]):
        rows = list(grp)
        trees.append(
            {
                "left_children": [r["lc"] for r in rows],
                "right_children": [r["rc"] for r in rows],
                "split_indices": [r["feat"] for r in rows],
                "split_conditions": [
                    r["leaf_val"] if r["lc"] == -1 else r["thr"] for r in rows
                ],
                "default_left": [int(r["default_left"]) for r in rows],
            }
        )
    return FlatForest.from_node_arrays(
        trees,
        [r["tree_class"] for r in tree_rows],
        np.array([r["epval"] for r in ep_rows], dtype=np.float64),
        base_score=float(meta.get("base_score", 0.0)),
    )


def roundtrip_forest(
    spark: SparkSession,
    forest: FlatForest | None = None,
    out_dir: str = DEFAULT_FOREST_DIR,
) -> FlatForest:
    """Full save→reload cycle returning the reloaded forest."""
    save_forest(spark, forest, out_dir)
    return load_forest(spark, out_dir)


_FOREST_CACHE: dict[str, tuple[tuple, FlatForest]] = {}


def _forest_stamp(out_dir: str) -> tuple:
    """Content stamp of the staged node files (name, size, mtime_ns): a
    restage at the same path invalidates warm-worker caches — Spark
    reuses Python workers across queries, so a path-only key would serve
    a STALE model after save_forest overwrites the dir."""
    nodes_dir = os.path.join(out_dir, "nodes")
    stamp = []
    for f in sorted(os.listdir(nodes_dir)):
        if f.endswith(".parquet"):
            st = os.stat(os.path.join(nodes_dir, f))
            stamp.append((f, st.st_size, st.st_mtime_ns))
    return tuple(stamp)


def load_forest_arrays(out_dir: str = DEFAULT_FOREST_DIR) -> FlatForest:
    """EXECUTOR-side forest load: pure pyarrow, no SparkSession — for
    mapInPandas scorers that load the model inside the worker process
    (the reference's load-binaries-at-startup shape, play_eppa_cpu.py:
    80-87). Cached per process keyed on the node-file content stamp, so
    repeated Arrow batches pay zero reload and a restaged model is picked
    up; float64 bytes are identical to the driver-side load_forest."""
    stamp = _forest_stamp(out_dir)
    cached = _FOREST_CACHE.get(out_dir)
    if cached is not None and cached[0] == stamp:
        return cached[1]
    import pyarrow.parquet as pq

    nodes = (
        pq.read_table(os.path.join(out_dir, "nodes"))
        .to_pandas()
        .sort_values(["tree_id", "node_id"])
    )
    tree_rows = (
        pq.read_table(os.path.join(out_dir, "trees"))
        .to_pandas()
        .sort_values("tree_id")
    )
    ep = (
        pq.read_table(os.path.join(out_dir, "epvals"))
        .to_pandas()
        .sort_values("class_id")
    )
    meta = pq.read_table(os.path.join(out_dir, "meta")).to_pandas()
    base_score = float(
        dict(zip(meta["key"], meta["value"])).get("base_score", 0.0)
    )
    # single grouped pass over the sorted node table (linear, not
    # per-tree boolean filters over the whole frame)
    trees = []
    for _, g in nodes.groupby("tree_id", sort=True):
        lc = g["lc"].tolist()
        trees.append(
            {
                "left_children": lc,
                "right_children": g["rc"].tolist(),
                "split_indices": g["feat"].tolist(),
                "split_conditions": [
                    float(leaf) if l == -1 else float(thr)
                    for l, thr, leaf in zip(lc, g["thr"], g["leaf_val"])
                ],
                "default_left": [int(d) for d in g["default_left"]],
            }
        )
    forest = FlatForest.from_node_arrays(
        trees,
        tree_rows["tree_class"].tolist(),
        ep["epval"].to_numpy(dtype=np.float64),
        base_score=base_score,
    )
    _FOREST_CACHE[out_dir] = (stamp, forest)
    return forest


# The relational twin (m1_tree_ensemble_score) compiles its spec to SQL; its
# artifact is the same 16-row tree table with feature *indices* into the
# query's static feature-expression list. The loaded rows regenerate the CASE
# cascade bit-identically (floats print via repr, which parquet preserves).

DEFAULT_RELATIONAL_SPEC_DIR = os.path.join(
    _REPO_ROOT, "spark-warehouse", "artifacts", "relational_ensemble"
)

_SPEC_SCHEMA = (
    "tree_id int, cls int, fa_idx int, thr_a double, "
    "fb_idx int, thr_b double, leaves array<double>"
)


def save_relational_spec(
    spark: SparkSession, rows: list[dict], out_dir: str = DEFAULT_RELATIONAL_SPEC_DIR
) -> str:
    """Persist the relational-ensemble spec rows as a parquet artifact."""
    data = [
        (
            int(r["tree_id"]),
            int(r["cls"]),
            int(r["fa_idx"]),
            float(r["thr_a"]),
            int(r["fb_idx"]),
            float(r["thr_b"]),
            [float(v) for v in r["leaves"]],
        )
        for r in rows
    ]
    local_rows_df(spark, data, _SPEC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(out_dir)
    return out_dir


def load_relational_spec(
    spark: SparkSession, out_dir: str = DEFAULT_RELATIONAL_SPEC_DIR
) -> list[dict]:
    """Reload the relational-ensemble spec, ordered by tree_id."""
    rows = sorted(spark.read.parquet(out_dir).collect(), key=lambda r: r["tree_id"])
    return [
        {
            "tree_id": r["tree_id"],
            "cls": r["cls"],
            "fa_idx": r["fa_idx"],
            "thr_a": r["thr_a"],
            "fb_idx": r["fb_idx"],
            "thr_b": r["thr_b"],
            "leaves": list(r["leaves"]),
        }
        for r in rows
    ]


def roundtrip_relational_spec(
    spark: SparkSession, rows: list[dict], out_dir: str = DEFAULT_RELATIONAL_SPEC_DIR
) -> list[dict]:
    """Full save→reload cycle returning the reloaded spec rows."""
    save_relational_spec(spark, rows, out_dir)
    return load_relational_spec(spark, out_dir)


__all__ = [
    "DEFAULT_ARTIFACT_DIR",
    "DEFAULT_ENSEMBLE_DIR",
    "DEFAULT_RELATIONAL_SPEC_DIR",
    "save_priors",
    "load_priors",
    "roundtrip_priors",
    "save_ensemble",
    "load_ensemble",
    "roundtrip_ensemble",
    "DEFAULT_FOREST_DIR",
    "save_forest",
    "load_forest",
    "roundtrip_forest",
    "load_forest_arrays",
    "save_relational_spec",
    "load_relational_spec",
    "roundtrip_relational_spec",
    "p_t_prior",
    "T_given_L_prior",
]
