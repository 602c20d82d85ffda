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

Fidelity knobs a real trained artifact exercises, all honored:

- ``learner_model_param.base_score`` — xgboost stores this in the
  OBJECTIVE's output (probability) space and applies
  ``ObjFunction::ProbToMargin`` at predict time, so the loader applies the
  same link before storing it as the uniform per-class margin offset:
  logit for ``binary:logistic``/``reg:logistic``, log for
  poisson/gamma/tweedie, identity for ``multi:softprob`` and the
  squared-error family. Margins then match ``output_margin=True`` exactly
  (e.g. the pinned xgboost-2 binary doc's ``base_score "5E-1"`` adds
  logit(0.5) = 0, not 0.5). Unknown objectives raise rather than guess.
- per-node ``default_left`` — NaN features route to the flagged child
  exactly as xgboost's missing-value handling does, instead of falling
  through the ``< thr`` comparison (which would always send NaN right);
- ``dart`` boosters — a real dart ``save_model`` nests the tree model under
  ``gradient_booster.model.gbtree`` and carries per-tree ``weight_drop``
  scales applied to leaf outputs at predict time; the loader unwraps the
  nesting and folds each tree's drop weight into its leaf values (so a
  dart doc re-serializes as an equivalent plain gbtree, not byte-for-byte).

The legacy depth-2 ``TreeEnsemble`` serializes through the same schema via
``TreeEnsemble.to_forest()``.
"""

from __future__ import annotations

import json
import math

import numpy as np

from bigdatabowl_spark.kernels.ensemble import EPVALS, FlatForest, TreeEnsemble

_INT_MAX = 2147483647  # xgboost's "no parent" sentinel

# ObjFunction::ProbToMargin links (xgboost src/objective/regression_obj.cu,
# multiclass_obj.cu): base_score is SAVED in probability/output space; the
# margin-space offset is link(base_score).
# binary:logitraw is LOGIT, not identity: LogisticRaw overrides
# PredTransform (identity at predict time) but NOT ProbToMargin, so it
# inherits LogisticRegression's logit link (xgboost
# src/objective/regression_loss.h — the inherited CHECK also requires
# base_score in (0,1)). At the default 0.5 the two links coincide
# (logit(0.5) = 0), which is why the earlier identity classification
# never mis-scored the fixtures (ADVICE r7; pinned by
# tests/test_xgb_json.py::test_logitraw_base_score_uses_logit_link).
_LOGIT_OBJECTIVES = frozenset(
    {"binary:logistic", "reg:logistic", "binary:logitraw"}
)
_LOG_OBJECTIVES = frozenset({"count:poisson", "reg:gamma", "reg:tweedie"})
_IDENTITY_OBJECTIVES = frozenset(
    {
        "multi:softprob",
        "multi:softmax",
        "reg:squarederror",
        "reg:linear",  # pre-1.0 alias of squarederror
        "reg:absoluteerror",
        "reg:pseudohubererror",
        "binary:hinge",
        "rank:pairwise",
        "rank:ndcg",
        "rank:map",
    }
)


def _prob_to_margin(base_score: float, objective: str) -> float:
    """Apply the objective's prob-to-margin link to a saved base_score.

    Missing/empty objective (our own emitted synthetic docs and legacy
    depth-2 artifacts) is identity; an unrecognized objective raises so we
    never silently mis-offset a real model."""
    if objective in _LOGIT_OBJECTIVES:
        if not 0.0 < base_score < 1.0:
            raise ValueError(
                f"xgb_json: base_score {base_score!r} outside (0,1) for "
                f"logistic objective {objective!r}"
            )
        return math.log(base_score / (1.0 - base_score))
    if objective in _LOG_OBJECTIVES:
        if base_score <= 0.0:
            raise ValueError(
                f"xgb_json: base_score {base_score!r} not positive for "
                f"log-link objective {objective!r}"
            )
        return math.log(base_score)
    if not objective or objective in _IDENTITY_OBJECTIVES:
        return base_score
    raise ValueError(
        f"xgb_json: unknown objective {objective!r} — its base_score link "
        "(ProbToMargin) is unknown; add it to the link tables rather than "
        "guessing identity"
    )


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
                "num_feature": str(num_feature),
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
    booster_name = booster.get("name", "gbtree")
    if booster_name not in ("gbtree", "dart"):
        raise ValueError(
            f"xgb_json: unsupported booster {booster_name!r} — only "
            "tree boosters load (gblinear has no tree structure)"
        )
    weight_drop: list[float] | None = None
    if booster_name == "dart":
        # dart nests the tree model one level down and scales each tree's
        # leaf output by weight_drop[t] at predict time
        dart = booster["model"]
        model = dart["gbtree"]
        weight_drop = [float(w) for w in dart.get("weight_drop", [])]
    else:
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
    objective = learner.get("objective", {}).get("name", "")
    base_score = _prob_to_margin(
        float(lmp.get("base_score", "0") or "0"), objective
    )
    epvals = (
        EPVALS[:n_class].copy()
        if n_class <= len(EPVALS)
        else np.arange(n_class, dtype=np.float64)
    )
    trees = model["trees"]
    if weight_drop:
        scaled = []
        for t, tree in enumerate(trees):
            w = weight_drop[t] if t < len(weight_drop) else 1.0
            sc = [
                w * float(c) if lc == -1 else c
                for c, lc in zip(tree["split_conditions"], tree["left_children"])
            ]
            scaled.append({**tree, "split_conditions": sc})
        trees = scaled
    return FlatForest.from_node_arrays(
        trees, model["tree_info"], epvals, base_score=base_score
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
