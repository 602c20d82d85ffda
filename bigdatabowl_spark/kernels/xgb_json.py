"""XGBoost JSON-model codec for the kernel's forest scorers.

The reference version-pins compiled xgboost/treelite binaries and loads
them at startup (play_eppa_cpu.py:80-87); its value models are standard
xgboost trained at default depth (Rishav's xyac.ipynb · cells 5-11).
xgboost itself is not installed in this environment, so the kernel scores
through the NumPy ``FlatForest`` — this module proves the ARTIFACT
pluggability for ANY depth: the loader reconstructs a ``FlatForest`` from
any multiclass xgboost ``save_model(...json)`` document (learner /
gradient_booster / model / trees with flat node arrays, leaf values held in
``split_conditions`` at leaf positions, per-tree class ids in
``tree_info``), preserving node order verbatim so load → save is
byte-for-byte, and scoring bit-identically to single-row traversal of the
source trees (same comparisons, one leaf add per tree in tree order).

Fidelity knobs a real trained artifact exercises, both honored:

- ``learner_model_param.base_score`` — applied as the uniform per-class
  margin offset (softprob-invariant, but margins match xgboost's
  ``output_margin=True``);
- per-node ``default_left`` — NaN features route to the flagged child
  exactly as xgboost's missing-value handling does, instead of falling
  through the ``< thr`` comparison (which would always send NaN right).

The legacy depth-2 ``TreeEnsemble`` serializes through the same schema via
``TreeEnsemble.to_forest()``.
"""

from __future__ import annotations

import json

import numpy as np

from bigdatabowl_spark.kernels.ensemble import EPVALS, FlatForest, TreeEnsemble

_INT_MAX = 2147483647  # xgboost's "no parent" sentinel


def forest_to_xgb_json(forest: FlatForest) -> dict:
    """Serialize a FlatForest as an xgboost ``save_model`` JSON document.

    Per-tree node arrays come straight from ``FlatForest.tree_nodes`` (the
    stored node order), so ``forest_from_xgb_json(forest_to_xgb_json(f))``
    reproduces ``f``'s arrays exactly.
    """
    # learner-level feature count, emitted uniformly into every tree's
    # tree_param (xgboost writes the global count per tree; a running max
    # would make tree 0's metadata depend on tree order)
    internal = forest.left != np.arange(len(forest.left))
    num_feature = int(forest.feat[internal].max()) + 1 if internal.any() else 0
    trees = []
    for t in range(forest.n_trees):
        nodes = forest.tree_nodes(t)
        n = len(nodes["left_children"])
        parents = [_INT_MAX] * n
        for i, (l, r) in enumerate(
            zip(nodes["left_children"], nodes["right_children"])
        ):
            if l != -1:
                parents[l] = i
                parents[r] = i
        trees.append(
            {
                "id": t,
                "left_children": nodes["left_children"],
                "right_children": nodes["right_children"],
                "parents": parents,
                "split_indices": nodes["split_indices"],
                "split_conditions": nodes["split_conditions"],
                "default_left": nodes["default_left"],
                "split_type": [0] * n,
                "base_weights": [0.0] * n,
                "loss_changes": [0.0] * n,
                "sum_hessian": [0.0] * n,
                "categories": [],
                "categories_nodes": [],
                "categories_segments": [],
                "categories_sizes": [],
                "tree_param": {
                    "num_nodes": str(n),
                    "num_feature": str(num_feature),
                    "size_leaf_vector": "1",
                },
            }
        )
    n_class = forest.n_classes
    return {
        "version": [1, 7, 6],
        "learner": {
            "attributes": {},
            "feature_names": [],
            "feature_types": [],
            "learner_model_param": {
                "base_score": repr(forest.base_score),
                "boost_from_average": "1",
                "num_class": str(n_class),
                "num_feature": "26",
                "num_target": "1",
            },
            "objective": {
                "name": "multi:softprob",
                "softmax_multiclass_param": {"num_class": str(n_class)},
            },
            "gradient_booster": {
                "name": "gbtree",
                "model": {
                    "gbtree_model_param": {
                        "num_trees": str(forest.n_trees),
                        "num_parallel_tree": "1",
                    },
                    "tree_info": [int(c) for c in forest.tree_class],
                    "trees": trees,
                },
            },
        },
    }


def ensemble_to_xgb_json(ens: TreeEnsemble) -> dict:
    """Serialize the depth-2 TreeEnsemble through the general schema."""
    return forest_to_xgb_json(ens.to_forest())


def forest_from_xgb_json(doc: dict) -> FlatForest:
    """Reconstruct a FlatForest from any xgboost JSON model document.

    Arbitrary depth, arbitrary (including degenerate leaf-only) tree
    shapes; node order is kept verbatim. Class-value vector: the engine's
    EPVALS when the class count fits (the reference's 8-class EP chart,
    play_eppa_cpu.py:136-149), else 0..C-1.
    """
    learner = doc["learner"]
    booster = learner["gradient_booster"]
    if booster.get("name", "gbtree") not in ("gbtree", "dart"):
        raise ValueError(
            f"xgb_json: unsupported booster {booster.get('name')!r} — only "
            "tree boosters load (gblinear has no tree structure)"
        )
    model = booster["model"]
    for tree in model["trees"]:
        # categorical splits (split_type 1) partition by category set, not
        # `< thr` — loading them as numeric would silently mis-route
        if any(s != 0 for s in tree.get("split_type", [])):
            raise ValueError(
                "xgb_json: categorical splits (split_type != 0) are not "
                "supported — retrain with numeric features or one-hot"
            )
        slv = tree.get("tree_param", {}).get("size_leaf_vector", "1")
        if slv not in ("0", "1"):
            raise ValueError(
                "xgb_json: vector leaves (size_leaf_vector "
                f"{slv}) are not supported — scalar-leaf multiclass only"
            )
    lmp = learner.get("learner_model_param", {})
    n_class = int(lmp.get("num_class", "1") or "1") or 1
    base_score = float(lmp.get("base_score", "0") or "0")
    epvals = (
        EPVALS[:n_class].copy()
        if n_class <= len(EPVALS)
        else np.arange(n_class, dtype=np.float64)
    )
    return FlatForest.from_node_arrays(
        model["trees"], model["tree_info"], epvals, base_score=base_score
    )


# Kept name: pre-r6 callers loaded depth-2 models through this symbol.
ensemble_from_xgb_json = forest_from_xgb_json


def save_xgb_json(model: FlatForest | TreeEnsemble, path: str) -> None:
    doc = (
        forest_to_xgb_json(model)
        if isinstance(model, FlatForest)
        else ensemble_to_xgb_json(model)
    )
    with open(path, "w") as f:
        json.dump(doc, f)


def load_xgb_json(path: str) -> FlatForest:
    with open(path) as f:
        return forest_from_xgb_json(json.load(f))
